import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weakcube_tpu.config import get_cfg
from weakcube_tpu.models.rcnn3d import build_model
from weakcube_tpu.structures import GroundTruth


def tiny_cfg(meta="RCNN3D", heads="ROIHeads3D"):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = meta
    cfg.MODEL.ROI_HEADS.NAME = heads
    cfg.MODEL.BACKBONE.NAME = "build_resnet_from_vision_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POSITIVE_FRACTION = 1.0
    cfg.MODEL.RPN.IOU_THRESHOLDS = [0.05, 0.05]
    cfg.TEST.DETECTIONS_PER_IMAGE = 16
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.loss_functions = ["iou", "z_pseudo_gt_center", "pose_alignment", "pose_ground", "dims"]
    return cfg


def tiny_batch(B=2, H=128, W=128, G=8, with_depth=False, seed=0):
    rng = np.random.default_rng(seed)
    K = np.tile(np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                         np.float32), (B, 1, 1))
    gt_boxes = []
    gt_boxes3D = []
    gt_poses = []
    classes = rng.integers(0, 5, (B, G)).astype(np.int32)
    valid = np.zeros((B, G), bool)
    valid[:, :4] = True
    for b in range(B):
        x1 = rng.uniform(5, W - 40, G)
        y1 = rng.uniform(5, H - 40, G)
        w = rng.uniform(16, 40, G)
        h = rng.uniform(16, 40, G)
        gt_boxes.append(np.stack([x1, y1, x1 + w, y1 + h], -1))
        cx, cy = x1 + w / 2, y1 + h / 2
        z = rng.uniform(2, 8, G)
        dims = rng.uniform(0.3, 1.5, (G, 3))
        x3d = z * (cx - W / 2) / 100.0
        y3d = z * (cy - H / 2) / 100.0
        gt_boxes3D.append(np.concatenate(
            [np.stack([cx, cy, z], -1), dims, np.stack([x3d, y3d, z], -1)], -1))
        gt_poses.append(np.tile(np.eye(3, dtype=np.float32), (G, 1, 1)))
    gt = GroundTruth(
        boxes=jnp.asarray(np.stack(gt_boxes), jnp.float32),
        classes=jnp.asarray(classes),
        valid=jnp.asarray(valid),
        boxes3D=jnp.asarray(np.stack(gt_boxes3D), jnp.float32),
        poses=jnp.asarray(np.stack(gt_poses)))
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32)),
        "image_wh": jnp.asarray(np.tile([[W, H]], (B, 1)).astype(np.float32)),
        "K": jnp.asarray(K),
        "gt": gt,
    }
    if with_depth:
        batch["depth_map"] = jnp.asarray(rng.uniform(1, 10, (B, H, W)).astype(np.float32))
        batch["ground_mask"] = jnp.ones((B, H, W), bool)
        batch["ground_valid"] = jnp.ones((B,), bool)
    return batch


class TestSupervisedModel:
    def test_train_losses(self):
        cfg = tiny_cfg().freeze()
        model = build_model(cfg)
        batch = tiny_batch()
        params = model.init({"params": jax.random.PRNGKey(0)}, batch, train=True,
                            rng=jax.random.PRNGKey(1))
        (losses, metrics), _ = model.apply(
            params, batch, train=True, rng=jax.random.PRNGKey(2),
            mutable=["batch_stats"])
        for k in ["rpn/cls", "rpn/loc", "BoxHead/loss_cls", "BoxHead/loss_box_reg",
                  "Cube/loss_z", "Cube/loss_xy", "Cube/loss_dims", "Cube/loss_pose",
                  "Cube/loss_joint", "Cube/uncert"]:
            assert k in losses, f"missing {k}: {sorted(losses)}"
            assert np.isfinite(float(losses[k])), f"{k} not finite"

    def test_inference_shapes(self):
        cfg = tiny_cfg().freeze()
        model = build_model(cfg)
        batch = tiny_batch()
        params = model.init({"params": jax.random.PRNGKey(0)}, batch, train=True,
                            rng=jax.random.PRNGKey(1))
        det = model.apply(params, batch, train=False)
        assert det.boxes.shape == (2, 16, 4)
        assert det.centers3D.shape == (2, 16, 3)
        assert det.poses3D.shape == (2, 16, 3, 3)
        assert np.all(np.isfinite(np.asarray(det.scores3D)))


class TestWeakModel:
    def test_train_losses(self):
        cfg = tiny_cfg("RCNN3D_combined_features", "ROIHeads3DScore").freeze()
        # priors for 5 classes
        priors = {"priors_dims_per_cat": np.tile(
            np.array([[[0.8, 0.8, 0.8], [0.3, 0.3, 0.3]]], np.float32), (5, 1, 1))}
        model = build_model(cfg, priors)
        batch = tiny_batch(with_depth=True)
        params = model.init({"params": jax.random.PRNGKey(0)}, batch, train=True,
                            rng=jax.random.PRNGKey(1))
        (losses, metrics), _ = model.apply(
            params, batch, train=True, rng=jax.random.PRNGKey(2),
            mutable=["batch_stats"])
        for k in ["rpn/cls", "BoxHead/loss_cls", "Cube/loss_iou", "Cube/loss_pose",
                  "Cube/loss_normal_vec", "Cube/loss_pseudo_gt_z",
                  "Cube/loss_dims_w", "Cube/uncert"]:
            assert k in losses, f"missing {k}: {sorted(losses)}"
            assert np.isfinite(float(losses[k])), f"{k} not finite"

    def test_grads_flow(self):
        cfg = tiny_cfg("RCNN3D_combined_features", "ROIHeads3DScore").freeze()
        priors = {"priors_dims_per_cat": np.tile(
            np.array([[[0.8, 0.8, 0.8], [0.3, 0.3, 0.3]]], np.float32), (5, 1, 1))}
        model = build_model(cfg, priors)
        batch = tiny_batch(with_depth=True)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=True,
                               rng=jax.random.PRNGKey(1))

        def loss_fn(params):
            (losses, _), _ = model.apply(
                {"params": params, "batch_stats": variables.get("batch_stats", {})},
                batch, train=True, rng=jax.random.PRNGKey(2),
                mutable=["batch_stats"])
            return sum(losses.values())

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        # the cube head must receive gradient signal
        flat = jax.tree_util.tree_flatten_with_path(g)[0]
        cube_grads = [np.abs(np.asarray(v)).sum() for p, v in flat
                      if any("cube_head" in str(k) for k in p)]
        assert sum(cube_grads) > 0


class Test2DOnlyMode:
    def test_loss_w_3d_zero_skips_cube_losses(self):
        cfg = tiny_cfg()
        cfg.MODEL.ROI_CUBE_HEAD.LOSS_W_3D = 0.0
        cfg.freeze()
        model = build_model(cfg)
        batch = tiny_batch()
        params = model.init({"params": jax.random.PRNGKey(0)}, batch, train=True,
                            rng=jax.random.PRNGKey(1))
        (losses, metrics), _ = model.apply(
            params, batch, train=True, rng=jax.random.PRNGKey(2),
            mutable=["batch_stats"])
        assert not any(k.startswith("Cube/") for k in losses), sorted(losses)
        for k in ["rpn/cls", "BoxHead/loss_cls"]:
            assert k in losses and np.isfinite(float(losses[k]))


class TestAllWeakLosses:
    def test_z_depth_segmentation_losses(self):
        """The remaining weak losses (area-search z, depth range,
        segmentation hull) with per-GT instance masks."""
        cfg = tiny_cfg("RCNN3D_combined_features", "ROIHeads3DScore")
        cfg.loss_functions = ["z", "depth", "segmentation"]
        cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
        cfg.freeze()
        priors = {"priors_dims_per_cat": np.tile(
            np.array([[[0.8, 0.8, 0.8], [0.3, 0.3, 0.3]]], np.float32), (5, 1, 1))}
        model = build_model(cfg, priors)
        batch = tiny_batch(with_depth=True)
        # per-GT instance masks at quarter resolution
        rng = np.random.default_rng(0)
        G = batch["gt"].boxes.shape[1]
        masks = np.zeros((2, G, 32, 32), bool)
        boxes = np.asarray(batch["gt"].boxes)
        for b in range(2):
            for g in range(G):
                x1, y1, x2, y2 = (boxes[b, g] / 128 * 32).astype(int)
                masks[b, g, max(y1, 0):y2 + 1, max(x1, 0):x2 + 1] = True
        batch["instance_masks"] = jnp.asarray(masks)
        params = model.init({"params": jax.random.PRNGKey(0)}, batch, train=True,
                            rng=jax.random.PRNGKey(1))
        (losses, _), _ = model.apply(params, batch, train=True,
                                     rng=jax.random.PRNGKey(2),
                                     mutable=["batch_stats"])
        for k in ["Cube/loss_z", "Cube/loss_depth", "Cube/loss_seg"]:
            assert k in losses, sorted(losses)
            assert np.isfinite(float(losses[k])), k


class TestPrecomputedAnchorLabels:
    def test_rpn_labels_input_bit_identical(self):
        """batch["rpn_labels"] from make_anchor_labeler must reproduce the
        in-graph labelling bit-for-bit (the round-4 libtpu-escape plumbing
        must not change any numerics)."""
        from weakcube_tpu.models.rcnn3d import make_anchor_labeler
        cfg = tiny_cfg()
        cfg.TPU.IMAGE_SIZE = 128
        model = build_model(cfg)
        batch = tiny_batch()
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, batch, train=True,
                               rng=jax.random.fold_in(rng, 1))
        step_rng = jax.random.fold_in(rng, 2)

        losses_a, _ = model.apply(variables, batch, train=True, rng=step_rng,
                                  mutable=["batch_stats"])[0]
        labeler = make_anchor_labeler(cfg, (128, 128))
        labels = labeler(step_rng, batch["gt"])
        losses_b, _ = model.apply(variables,
                                  dict(batch, rpn_labels=labels),
                                  train=True, rng=step_rng,
                                  mutable=["batch_stats"])[0]
        assert set(losses_a) == set(losses_b)
        for k in losses_a:
            np.testing.assert_array_equal(np.asarray(losses_a[k]),
                                          np.asarray(losses_b[k]),
                                          err_msg=k)
