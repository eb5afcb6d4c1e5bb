"""Zoo-checkpoint converter structure test: a synthetic detectron2-named
Cube R-CNN state dict must convert into a tree that the flax RCNN3D applies
with (inference runs end-to-end on the converted params)."""
import jax
import jax.numpy as jnp
import numpy as np

from weakcube_tpu.config import get_cfg
from weakcube_tpu.models.rcnn3d import build_model
from weakcube_tpu.utils.zoo_convert import convert_zoo_checkpoint


def _cfg(num_classes=5):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RCNN3D"
    cfg.MODEL.ROI_HEADS.NAME = "ROIHeads3D"
    cfg.MODEL.BACKBONE.NAME = "build_dla_from_vision_fpn_backbone"
    cfg.MODEL.DLA.TYPE = "dla34"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = num_classes
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.IMAGE_SIZE = 64
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg.freeze()


def _fake_d2_state_dict(init_params, init_stats):
    """Build the d2-named dict by INVERTING the converter's mapping rules
    from our init tree — guarantees full coverage of the mapping table."""
    rng = np.random.default_rng(0)
    sd = {}

    def put_conv(name, kern, bias=None):
        sd[name + ".weight"] = np.transpose(np.asarray(kern), (3, 2, 0, 1))
        if bias is not None:
            sd[name + ".bias"] = np.asarray(bias)

    def put_dense(name, node):
        sd[name + ".weight"] = np.asarray(node["kernel"]).T
        sd[name + ".bias"] = np.asarray(node["bias"])

    def put_bn(name, pnode, snode):
        sd[name + ".weight"] = np.asarray(pnode["scale"])
        sd[name + ".bias"] = np.asarray(pnode["bias"])
        sd[name + ".running_mean"] = np.asarray(snode["mean"])
        sd[name + ".running_var"] = np.asarray(snode["var"])

    bu = init_params["bottom_up"]
    bs = init_stats["bottom_up"]
    pre = "backbone.bottom_up."
    put_conv(pre + "base_layer.0", bu["base_conv"]["kernel"])
    put_bn(pre + "base_layer.1", bu["base_bn"], bs["base_bn"])
    for li in (0, 1):
        put_conv(f"{pre}level{li}.0", bu[f"level{li}_conv"]["kernel"])
        put_bn(f"{pre}level{li}.1", bu[f"level{li}_bn"], bs[f"level{li}_bn"])

    def emit_block(prefix, pnode, snode):
        for ci in (1, 2):
            put_conv(f"{prefix}.conv{ci}", pnode[f"conv{ci}"]["kernel"])
            put_bn(f"{prefix}.bn{ci}", pnode[f"bn{ci}"], snode[f"bn{ci}"])

    def emit_tree(prefix, pnode, snode):
        for t in ("tree1", "tree2"):
            child_p, child_s = pnode[t], snode[t]
            if "conv1" in child_p:  # leaf block
                emit_block(f"{prefix}.{t}", child_p, child_s)
            else:
                emit_tree(f"{prefix}.{t}", child_p, child_s)
        if "root" in pnode:
            put_conv(f"{prefix}.root.conv", pnode["root"]["conv"]["kernel"])
            put_bn(f"{prefix}.root.bn", pnode["root"]["bn"], snode["root"]["bn"])
        if "project_conv" in pnode:
            put_conv(f"{prefix}.project.0", pnode["project_conv"]["kernel"])
            put_bn(f"{prefix}.project.1", pnode["project_bn"], snode["project_bn"])

    for li in (2, 3, 4, 5):
        emit_tree(f"{pre}level{li}", bu[f"level{li}"], bs[f"level{li}"])

    fpn = init_params["backbone"]["fpn"]
    for i, name in enumerate(("p2", "p3", "p4", "p5", "p6")):
        put_conv(f"backbone.fpn_lateral{i + 2}", fpn[f"lateral_{name}"]["kernel"],
                 fpn[f"lateral_{name}"]["bias"])
        put_conv(f"backbone.fpn_output{i + 2}", fpn[f"output_{name}"]["kernel"],
                 fpn[f"output_{name}"]["bias"])

    rpn = init_params["rpn_head"]
    put_conv("proposal_generator.rpn_head.conv", rpn["conv"]["kernel"],
             rpn["conv"]["bias"])
    put_conv("proposal_generator.rpn_head.objectness_logits",
             rpn["objectness"]["kernel"], rpn["objectness"]["bias"])
    put_conv("proposal_generator.rpn_head.anchor_deltas",
             rpn["deltas"]["kernel"], rpn["deltas"]["bias"])

    rh = init_params["roi_heads"]
    put_dense("roi_heads.box_head.fc1", rh["box_head"]["fc1"])
    put_dense("roi_heads.box_head.fc2", rh["box_head"]["fc2"])
    put_dense("roi_heads.box_predictor.cls_score", rh["box_predictor"]["cls_score"])
    put_dense("roi_heads.box_predictor.bbox_pred", rh["box_predictor"]["bbox_pred"])
    ch = rh["cube_head"]
    put_dense("roi_heads.cube_head.feature_generator.fc1", ch["shared_fc1"])
    put_dense("roi_heads.cube_head.feature_generator.fc2", ch["shared_fc2"])
    for nm in ("bbox_3D_center_deltas", "bbox_3D_dims", "bbox_3D_pose",
               "bbox_3D_center_depth", "bbox_3D_uncertainty"):
        put_dense(f"roi_heads.cube_head.{nm}", ch[nm])
    return sd


def _tree_paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_tree_paths(v, p))
        else:
            out[p] = np.asarray(v)
    return out


class TestZooConversion:
    def test_roundtrip_tree_and_apply(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import __graft_entry__ as ge
        cfg = _cfg()
        model = build_model(cfg)
        batch = ge._tiny_batch(1, 64, 64, with_depth=False)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
        init_p = jax.device_get(variables["params"])
        init_s = jax.device_get(variables.get("batch_stats", {}))

        sd = _fake_d2_state_dict(init_p, init_s)
        conv_p, conv_s = convert_zoo_checkpoint(sd, cfg)

        # every converted leaf must exist in the init tree with equal VALUES
        # (the fake dict was built by inverting the mapping, so a correct
        # converter reproduces the init tree exactly)
        want_p = _tree_paths(init_p)
        got_p = _tree_paths(conv_p)
        missing = set(want_p) - set(got_p)
        extra = set(got_p) - set(want_p)
        assert not extra, f"unknown params: {sorted(extra)[:8]}"
        assert not missing, f"missing params: {sorted(missing)[:8]}"
        for k in want_p:
            np.testing.assert_allclose(got_p[k], want_p[k], atol=1e-6,
                                       err_msg=k)
        for k, v in _tree_paths(conv_s).items():
            np.testing.assert_allclose(v, _tree_paths(init_s)[k], atol=1e-6)

        # and the model must run on the converted tree
        det = model.apply({"params": conv_p, "batch_stats": conv_s},
                          batch, train=False)
        assert np.all(np.isfinite(np.asarray(det.scores3D)))

    def test_eval_only_model_weights_pth(self, tmp_path):
        """`--eval-only MODEL.WEIGHTS <zoo .pth>` end to end: a detectron2-
        named .pth is converted on the fly and evaluated on the synthetic
        Omni3D-format dataset, producing finite AP (reference M2 workflow:
        README.md:75-79 + tools/train_net.py:149-155)."""
        import os
        import sys

        import torch
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools.train_net import main, parse_args, setup

        repo = os.path.join(os.path.dirname(__file__), "..")
        opts = ["MODEL.META_ARCHITECTURE", "RCNN3D",
                "MODEL.ROI_HEADS.NAME", "ROIHeads3D",
                "MODEL.BACKBONE.NAME", "build_dla_from_vision_fpn_backbone",
                "MODEL.DLA.TYPE", "dla34",
                "TPU.IMAGE_SIZE", "128",
                "OUTPUT_DIR", str(tmp_path / "out")]
        argv = ["--config-file", os.path.join(repo, "configs/synthetic_smoke.yaml"),
                "--eval-only", "--synthetic", "4"] + opts

        # build the fake zoo .pth by inverting the converter mapping from an
        # init tree of the SAME cfg the CLI will evaluate with
        cfg = setup(parse_args(argv))
        model = build_model(cfg)
        import __graft_entry__ as ge
        batch = ge._tiny_batch(1, 64, 64, with_depth=False)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
        sd = _fake_d2_state_dict(jax.device_get(variables["params"]),
                                 jax.device_get(variables.get("batch_stats", {})))
        pth = tmp_path / "zoo_dla34.pth"
        torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                              for k, v in sd.items()}}, pth)

        results = main(argv + ["MODEL.WEIGHTS", str(pth)])
        assert results is not None and "AP2D" in results
        assert np.isfinite(results["AP2D"])
