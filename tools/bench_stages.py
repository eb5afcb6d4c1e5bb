#!/usr/bin/env python
"""Per-stage inference cost breakdown on one chip: backbone -> +RPN
proposals -> +box head -> full (cube head). Localises the next
optimisation target. Prints one JSON line per stage."""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("BENCH_BATCH", 32))
SIZE = 512


def timed(fn, args, iters=12):
    import jax
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]  # compile+sync
    import jax.numpy as jnp
    tiny = jax.jit(lambda v: v + 1)
    _ = float(tiny(jnp.zeros(())))
    rtts = []
    for _ in range(6):
        t0 = time.perf_counter()
        _ = float(tiny(jnp.zeros(())))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    per = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        per.append(time.perf_counter() - t0)
    return max(float(np.median(per)) - rtt, 1e-6)


def main():
    import jax
    import jax.numpy as jnp
    from weakcube_tpu.config import get_cfg
    from weakcube_tpu.models.rcnn3d import build_model
    from __graft_entry__ import _tiny_batch

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RCNN3D_combined_features"
    cfg.MODEL.ROI_HEADS.NAME = "ROIHeads3DScore"
    cfg.MODEL.BACKBONE.NAME = "build_dla_from_vision_fpn_backbone"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 38
    cfg.TPU.IMAGE_SIZE = SIZE
    cfg.TPU.USE_PALLAS_ROI_ALIGN = True
    # NMS-budget sweep knobs (inference box-head attack): shrink the
    # per-class NMS candidate pool / per-level RPN pools and re-measure
    if os.environ.get("BENCH_NMS_TOPK"):
        cfg.TEST.NMS_CANDIDATE_TOPK = int(os.environ["BENCH_NMS_TOPK"])
    if os.environ.get("BENCH_RPN_PRE"):
        cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = int(os.environ["BENCH_RPN_PRE"])
    if os.environ.get("BENCH_RPN_POST"):
        cfg.MODEL.RPN.POST_NMS_TOPK_TEST = int(os.environ["BENCH_RPN_POST"])
    cfg.freeze()
    priors = {"priors_dims_per_cat": np.tile(
        np.array([[[0.8, 0.8, 0.8], [0.3, 0.3, 0.3]]], np.float32), (38, 1, 1))}
    model = build_model(cfg, priors)
    batch = _tiny_batch(BATCH, SIZE, SIZE, with_depth=False)
    variables = jax.jit(lambda r: model.init({"params": r}, batch, train=False))(
        jax.random.PRNGKey(0))

    bound = model.bind(variables)

    @jax.jit
    def backbone_only(v, b):
        m = model.bind(v)
        return m.backbone(b["image"], train=False)["p2"]

    @jax.jit
    def through_rpn_head(v, b):
        m = model.bind(v)
        feats_dict = m.backbone(b["image"], train=False)
        feats = [feats_dict[f] for f in cfg.MODEL.RPN.IN_FEATURES]
        logits, deltas = m.rpn_head(feats)
        return logits[0]

    @jax.jit
    def through_proposals(v, b):
        m = model.bind(v)
        feats, proposals, _ = m._features_and_proposals(b, False, None)
        return proposals.boxes

    @jax.jit
    def through_boxhead(v, b):
        m = model.bind(v)
        feats, proposals, _ = m._features_and_proposals(b, False, None)
        det, _ = m.roi_heads.forward_box_inference(feats, proposals, b["image_wh"])
        return det.boxes

    @jax.jit
    def full(v, b):
        det = model.apply(v, b, train=False)
        return det.boxes

    stages = [("backbone_fpn", backbone_only),
              ("plus_rpn_head", through_rpn_head),
              ("plus_rpn_nms", through_proposals),
              ("plus_box_head", through_boxhead), ("full", full)]
    if os.environ.get("BENCH_STAGES_ONLY_FULL"):
        # sweep mode: one compile, one timing (NMS-budget sweeps)
        stages = [("full", full)]
    prev = 0.0
    for name, fn in stages:
        t = timed(fn, (variables, batch))
        print(json.dumps({"stage": name, "ms": round(t * 1e3, 1),
                          "ms_delta": round((t - prev) * 1e3, 1),
                          "img_per_s": round(BATCH / t, 1)}))
        prev = t


if __name__ == "__main__":
    main()
