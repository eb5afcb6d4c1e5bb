import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weakcube_tpu.config import get_cfg
from weakcube_tpu.models.backbone.build import BACKBONE_REGISTRY, build_backbone


def _shapes_ok(feats, size, channels):
    for i, name in enumerate(["p2", "p3", "p4", "p5", "p6"]):
        s = size // (4 * 2 ** i)
        assert feats[name].shape[1] == s and feats[name].shape[2] == s, \
            f"{name}: {feats[name].shape} expected spatial {s}"
        assert feats[name].shape[3] == channels


@pytest.mark.parametrize("name,extra", [
    ("build_resnet_from_vision_fpn_backbone", {"depth": 18}),
    ("build_dla_from_vision_fpn_backbone", {}),
    ("build_shufflenet_fpn_backbone", {}),
    ("build_mnasnet_fpn_backbone", {}),
    ("build_densenet_fpn_backbone", {}),
])
def test_backbone_pyramid_shapes(name, extra):
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = name
    if "depth" in extra:
        cfg.MODEL.RESNETS.DEPTH = extra["depth"]
    cfg.freeze()
    bb = build_backbone(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    variables = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    feats = bb.apply(variables, x, train=False)
    _shapes_ok(feats, 128, cfg.MODEL.FPN.OUT_CHANNELS)
    for f in feats.values():
        assert np.all(np.isfinite(np.asarray(f)))


def _torch_resnet18():
    """Minimal torch ResNet-18 trunk with torchvision parameter naming —
    reference oracle for the weight converter (no torchvision in this env)."""
    import torch
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, inp, out, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, out, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(out)
            self.conv2 = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(out)
            self.downsample = None
            if stride != 1 or inp != out:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, out, 1, stride, bias=False),
                    tnn.BatchNorm2d(out))

        def forward(self, x):
            idd = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idd)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            for i, (inp, out, n) in enumerate(
                    [(64, 64, 2), (64, 128, 2), (128, 256, 2), (256, 512, 2)]):
                blocks = [BasicBlock(inp, out, 1 if i == 0 else 2)]
                blocks += [BasicBlock(out, out) for _ in range(n - 1)]
                setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))

    net = Net()
    # randomise BN stats so the running-stats conversion is exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    net.eval()
    return net


class TestTorchConversion:
    def test_resnet18_numerical_parity(self):
        """Converted torch weights must reproduce the torch trunk's feature
        maps through our flax module (eval mode, running stats)."""
        torch = pytest.importorskip("torch")
        from weakcube_tpu.models.backbone.resnet import ResNetBottomUp
        from weakcube_tpu.utils.torch_convert import (
            convert_torchvision_resnet, torch_state_dict_to_numpy)

        tm = _torch_resnet18()
        sd = torch_state_dict_to_numpy(tm)
        params, stats = convert_torchvision_resnet(sd, 18)

        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)

        model = ResNetBottomUp(depth=18)
        outs = model.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(x), train=False)

        with torch.no_grad():
            t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            t = tm.maxpool(tm.relu(tm.bn1(tm.conv1(t))))
            c2 = tm.layer1(t); c3 = tm.layer2(c2)
            c4 = tm.layer3(c3); c5 = tm.layer4(c4)
        for ours, theirs in [(outs["p2"], c2), (outs["p3"], c3),
                             (outs["p4"], c4), (outs["p5"], c5)]:
            ref = np.transpose(theirs.numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4,
                                       rtol=1e-3)


def _torch_dla34():
    """Minimal torch DLA-34 trunk with the reference's detectron2 state-dict
    naming (cubercnn/modeling/backbone/dla.py:40-310) — numeric oracle for
    the zoo converter AND for the Tree residual-overwrite semantics
    (dla.py:219: Tree.forward replaces any incoming residual with its OWN
    project(bottom); the parent's project is dead compute)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    class Block(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)

        def forward(self, x, residual=None):
            if residual is None:
                residual = x
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + residual)

    class Root(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, 1, bias=False)
            self.bn = tnn.BatchNorm2d(cout)

        def forward(self, *xs):
            return torch.relu(self.bn(self.conv(torch.cat(xs, 1))))

    class Tree(tnn.Module):
        def __init__(self, levels, cin, cout, stride=1, level_root=False,
                     root_dim=0):
            super().__init__()
            if root_dim == 0:
                root_dim = 2 * cout
            if level_root:
                root_dim += cin
            if levels == 1:
                self.tree1 = Block(cin, cout, stride)
                self.tree2 = Block(cout, cout, 1)
                self.root = Root(root_dim, cout)
            else:
                self.tree1 = Tree(levels - 1, cin, cout, stride)
                self.tree2 = Tree(levels - 1, cout, cout,
                                  root_dim=root_dim + cout)
            self.levels = levels
            self.level_root = level_root
            self.downsample = tnn.MaxPool2d(stride, stride) if stride > 1 \
                else None
            self.project = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, bias=False),
                tnn.BatchNorm2d(cout)) if cin != cout else None

        def forward(self, x, children=None):
            children = [] if children is None else children
            bottom = self.downsample(x) if self.downsample else x
            residual = self.project(bottom) if self.project else bottom
            if self.level_root:
                children.append(bottom)
            if self.levels == 1:
                x1 = self.tree1(x, residual)
                x2 = self.tree2(x1)
                return self.root(x2, x1, *children)
            x1 = self.tree1(x)
            children.append(x1)
            return self.tree2(x1, children=children)

    class Trunk(tnn.Module):
        def __init__(self):
            super().__init__()
            self.base_layer = tnn.Sequential(
                tnn.Conv2d(3, 16, 7, 1, 3, bias=False),
                tnn.BatchNorm2d(16), tnn.ReLU())
            self.level0 = tnn.Sequential(
                tnn.Conv2d(16, 16, 3, 1, 1, bias=False),
                tnn.BatchNorm2d(16), tnn.ReLU())
            self.level1 = tnn.Sequential(
                tnn.Conv2d(16, 32, 3, 2, 1, bias=False),
                tnn.BatchNorm2d(32), tnn.ReLU())
            self.level2 = Tree(1, 32, 64, 2, level_root=False)
            self.level3 = Tree(2, 64, 128, 2, level_root=True)
            self.level4 = Tree(2, 128, 256, 2, level_root=True)
            self.level5 = Tree(1, 256, 512, 2, level_root=True)

        def forward(self, x):
            y = self.base_layer(x)
            y = self.level1(self.level0(y))
            l2 = self.level2(y)
            l3 = self.level3(l2)
            l4 = self.level4(l3)
            l5 = self.level5(l4)
            p6 = F.max_pool2d(l5, 1, 2, 0)
            return {"p2": l2, "p3": l3, "p4": l4, "p5": l5, "p6": p6}

    net = Trunk()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.2)
    net.eval()
    return net


class TestDLATorchParity:
    def test_dla34_numerical_parity(self):
        """Converted d2-named torch DLA-34 weights must reproduce the torch
        trunk's pyramid through the flax module. This specifically covers
        the Tree residual-overwrite rule: in the levels-2 trees (level3/4)
        the residual entering tree1's blocks comes from levelN.tree1.project,
        NOT the parent's levelN.project (which is dead in both frameworks) —
        a released checkpoint carries trained weights only in the former."""
        torch = pytest.importorskip("torch")
        from weakcube_tpu.models.backbone.dla import DLABottomUp
        from weakcube_tpu.utils.zoo_convert import convert_dla_bottom_up

        tm = _torch_dla34()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params, stats = convert_dla_bottom_up(sd, "dla34", prefix="")

        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)

        model = DLABottomUp(dla_type="dla34", dtype=jnp.float32)
        outs = model.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(x), train=False)

        with torch.no_grad():
            theirs = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        for name in ("p2", "p3", "p4", "p5", "p6"):
            ref = np.transpose(theirs[name].numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(np.asarray(outs[name]), ref,
                                       atol=5e-4, rtol=1e-3,
                                       err_msg=name)
