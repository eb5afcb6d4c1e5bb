#!/usr/bin/env python
"""Decompose the b32@512 DLA34-FPN INFERENCE step (~88 ms chained, round 4)
into per-stage jits on the real TPU — the honest-headline target is >=450
img/s (<=71 ms/b32), so find where the 88 ms live. One variant per process
(crash isolation); `all` runs every part in one process (inference graphs
have not faulted this libtpu).

Variants:
  backbone     DLA34-FPN forward (bf16)
  rpn          RPN head conv + select_proposals at test budgets (1000/1000)
  pool         box pooler on 1000 proposals (Pallas path, the default)
  poolxla      ... the XLA gather pooler instead
  poolmm       ... the dense-matmul pooler instead
  boxhead      2x1024 FC head + predictor on (B, 1000, 7, 7, 256)
  nms          fast_rcnn_inference (softmax -> topk -> NMS -> topk)
  full         whole model.apply (the headline graph, for the residual)
  all          all of the above, in order

Env: BENCH_BATCH (32), BENCH_INFER_WINDOW (Pallas window override).

Run: python tools/bench_infer_parts.py all
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_train_stages import timed  # noqa: E402


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    import jax.numpy as jnp

    from weakcube_tpu.config import get_cfg
    from weakcube_tpu.models.rcnn3d import build_model
    from weakcube_tpu.structures import GroundTruth

    B = int(os.environ.get("BENCH_BATCH", 32))
    S = 512
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RCNN3D_combined_features"
    cfg.MODEL.ROI_HEADS.NAME = "ROIHeads3DScore"
    cfg.MODEL.BACKBONE.NAME = "build_dla_from_vision_fpn_backbone"
    cfg.MODEL.DLA.TYPE = "dla34"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 38
    cfg.TPU.IMAGE_SIZE = S
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.USE_PALLAS_ROI_ALIGN = True
    cfg.freeze()

    priors = {"priors_dims_per_cat": np.tile(
        np.array([[[0.8, 0.8, 0.8], [0.3, 0.3, 0.3]]], np.float32),
        (38, 1, 1))}
    model = build_model(cfg, priors)

    rng = np.random.default_rng(0)
    K = np.tile(np.array([[500.0, 0, S / 2], [0, 500.0, S / 2], [0, 0, 1]],
                         np.float32), (B, 1, 1))
    G = 8
    gt = GroundTruth(
        boxes=jnp.asarray(rng.uniform(10, S - 60, (B, G, 4)).astype(np.float32)),
        classes=jnp.zeros((B, G), jnp.int32),
        valid=jnp.zeros((B, G), bool),
        boxes3D=jnp.zeros((B, G, 9)),
        poses=jnp.tile(jnp.eye(3), (B, G, 1, 1)))
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, S, S, 3)).astype(np.float32)),
        "image_wh": jnp.full((B, 2), float(S)),
        "K": jnp.asarray(K),
        "gt": gt,
    }
    variables = jax.jit(
        lambda r: model.init({"params": r}, batch, train=False)
    )(jax.random.PRNGKey(0))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    results = {}

    def measure(tag, thunk, iters=8):
        t0 = time.perf_counter()
        try:
            results[tag] = timed(thunk, iters=iters)
            print(f"# {tag}: {results[tag] * 1e3:.1f} ms (setup "
                  f"{time.perf_counter() - t0:.0f}s)", file=sys.stderr,
                  flush=True)
        except Exception as e:
            print(f"# {tag} FAILED: {e!r}", file=sys.stderr, flush=True)

    want = lambda *names: variant == "all" or variant in names

    # ---- backbone ---------------------------------------------------------
    bb_apply = jax.jit(lambda p, bs, img: model.apply(
        {"params": p, "batch_stats": bs}, img, train=False,
        method="backbone_forward"))
    feats = bb_apply(params, batch_stats, batch["image"])
    if want("backbone"):
        measure("backbone", lambda: float(bb_apply(
            params, batch_stats, batch["image"])["p2"].reshape(-1)[0]))

    # ---- RPN head + proposal selection at test budgets --------------------
    # _proposals_from_feats signature: (feats_dict, batch, train, rng_rpn)
    def rpn_fn(p, fs, bt):
        return model.apply({"params": p}, fs, bt, False, None,
                           method="_proposals_from_feats")[1]

    rpn_jit = jax.jit(rpn_fn)
    rpn_batch = {"image_wh": batch["image_wh"], "K": batch["K"]}
    proposals = rpn_jit(params, feats, rpn_batch)
    if want("rpn"):
        measure("rpn_select", lambda: float(
            rpn_jit(params, feats, rpn_batch).boxes.reshape(-1)[0]))

    feats_list_names = list(cfg.MODEL.ROI_HEADS.IN_FEATURES)
    feats_list = [feats[n] for n in feats_list_names]
    strides = [4 * 2 ** i for i in range(len(feats_list))]
    R = proposals.boxes.shape[1]
    print(f"# proposals: {R} per image", file=sys.stderr)

    # ---- box pooler variants ---------------------------------------------
    boxes = proposals.boxes
    if want("pool", "poolxla", "poolmm"):
        if want("pool"):
            from weakcube_tpu.ops.roi_align_pallas import \
                multilevel_roi_align_pallas
            win = int(os.environ.get("BENCH_INFER_WINDOW", 0))
            f32 = [f.astype(jnp.float32) for f in feats_list]
            pj = jax.jit(lambda fs, bx: multilevel_roi_align_pallas(
                fs, bx, strides, 7, 2, 2, win))
            measure("pool_pallas", lambda: float(
                pj(f32, boxes).reshape(-1)[0]))
        if want("poolxla"):
            from weakcube_tpu.ops.roi_align import multilevel_roi_align
            gj = jax.jit(lambda fs, bx: multilevel_roi_align(
                fs, bx, strides, 7, 2))
            measure("pool_gather", lambda: float(
                gj(feats_list, boxes).reshape(-1)[0]))
        if want("poolmm"):
            from weakcube_tpu.ops.roi_align import matmul_fwd
            mj = jax.jit(lambda fs, bx: matmul_fwd(fs, bx, strides, 7, 2))
            measure("pool_matmul", lambda: float(
                mj(feats_list, boxes).reshape(-1)[0]))

    # ---- box head + predictor --------------------------------------------
    if want("boxhead", "nms", "cube"):
        from weakcube_tpu.ops.roi_align_pallas import \
            multilevel_roi_align_pallas
        f32 = [f.astype(jnp.float32) for f in feats_list]
        pooled = jax.jit(lambda fs, bx: multilevel_roi_align_pallas(
            fs, bx, strides, 7, 2, 2, 0))(f32, boxes)

        def bh(p, x):
            def run(mdl):
                h = mdl.roi_heads.box_head(x)
                return mdl.roi_heads.box_predictor(h)
            return model.apply({"params": p}, method=lambda mdl: run(mdl))

        bh_jit = jax.jit(bh)
        if want("boxhead"):
            measure("box_head", lambda: float(
                bh_jit(params, pooled)[0].reshape(-1)[0]))
        scores, deltas = bh_jit(params, pooled)

        if want("nms"):
            from weakcube_tpu.models.fast_rcnn import (fast_rcnn_inference,
                                                       predict_boxes)
            def nms_fn(sc, dl, bx, pv):
                bpc = predict_boxes(
                    dl, bx, 38,
                    tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS))
                det, _ = fast_rcnn_inference(
                    sc, bpc, proposals._replace(boxes=bx, valid=pv),
                    batch["image_wh"],
                    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
                    cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                    cfg.TEST.DETECTIONS_PER_IMAGE,
                    candidate_topk=cfg.TEST.NMS_CANDIDATE_TOPK)
                return det
            nms_jit = jax.jit(nms_fn)
            measure("nms_inference", lambda: float(nms_jit(
                scores, deltas, boxes, proposals.valid).scores.reshape(-1)[0]))

    # ---- full model for reference ----------------------------------------
    if want("full"):
        fwd = jax.jit(lambda v, b: model.apply(v, b, train=False).scores3D[0, 0])
        measure("full", lambda: float(fwd(variables, batch)))

    for k, v in results.items():
        print(json.dumps({"metric": f"infer_part_{k}",
                          "value": round(v * 1e3, 2), "unit": "ms"}))


if __name__ == "__main__":
    main()
