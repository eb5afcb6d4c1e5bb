#!/usr/bin/env python
"""Price the NON-backbone train-forward components standalone at recipe
scale (b25@512px, DLA34-FPN shapes): the round-3 stage decomposition put
the full forward at ~308 ms of which the backbone is only ~17 ms — this
tool times each remaining stage as its own jit on the real TPU to find the
missing ~290 ms. Components (shapes mirror the production train graph):

  rpn_head        shared 3x3 conv + 1x1 heads over the 5 FPN levels
  rpn_label       label_and_sample_anchors over 65472 anchors x 16 GT
  rpn_loss        IoUness BCE + smooth-L1 over (B, 65472)
  select_props    per-level approx top-2000 -> NMS -> global top-1000
  roi_label       label_and_sample_proposals (1016 candidates -> 512 slots)
  box_pool        XLA-gather ROIAlign, 512 RoIs, res 7 (train fwd path)
  box_head        2x1024 FC head + predictor on (25, 512, 7, 7, 256)
  cube_pool_head  fg-prefix 128 RoIs pool + CubeHead
  weak_losses     decode + iou/z/pose_align/pose_ground losses on (25, 128)

Timing uses the per-sample adjacent-RTT subtraction from
bench_train_stages.timed (the axon tunnel RTT drifts 28-94 ms run to run).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_train_stages import timed  # noqa: E402  (same dir)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_batch
    from weakcube_tpu.config import get_cfg
    from weakcube_tpu.models import rpn as rpn_lib
    from weakcube_tpu.models import anchors as anchor_lib
    from weakcube_tpu.models.roi_heads import (ROIHeads3DScore,
                                               label_and_sample_proposals)
    from weakcube_tpu.structures import GroundTruth, Proposals

    B = int(os.environ.get("BENCH_TRAIN_BATCH", 25))
    S = int(os.environ.get("BENCH_TRAIN_SIZE", 512))
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "Omni_combined.yaml"))
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 38
    cfg.TPU.IMAGE_SIZE = S
    cfg.TPU.USE_PALLAS_ROI_ALIGN = False
    cfg.freeze()

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    sizes = [S // s for s in (4, 8, 16, 32, 64)]
    feats = [jnp.asarray(rng.normal(size=(B, hw, hw, 256)).astype(np.float32),
                         dtype=dt) for hw in sizes]
    batch = _tiny_batch(B, S, S, G=16, with_depth=True)
    gt = batch["gt"]

    results = {}

    def measure(tag, thunk, iters=8):
        t0 = time.perf_counter()
        try:
            results[tag] = timed(thunk, iters=iters)
            print(f"# {tag}: {results[tag]*1e3:.1f}ms "
                  f"(compiled+timed in {time.perf_counter() - t0:.0f}s)",
                  file=sys.stderr)
        except Exception as e:
            print(f"# {tag} FAILED: {e!r}", file=sys.stderr)

    # --- RPN head convs ---------------------------------------------------
    n_anchor = len(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0])
    head = rpn_lib.RPNHead(num_anchors=n_anchor, dtype=dt)
    hp = head.init(key, feats)

    def rpn_head_fn(p, fs):
        logits, deltas = head.apply(p, fs)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in logits) + \
            sum(jnp.sum(d.astype(jnp.float32)) for d in deltas)
    jf = jax.jit(rpn_head_fn)
    measure("rpn_head", lambda: jf(hp, feats))

    # --- anchors + labeling ----------------------------------------------
    anchors_lvl = anchor_lib.pyramid_anchors(
        [(hw, hw) for hw in sizes], [4, 8, 16, 32, 64],
        cfg.MODEL.ANCHOR_GENERATOR.SIZES,
        cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
        cfg.MODEL.ANCHOR_GENERATOR.OFFSET)
    anchors_all = jnp.concatenate(anchors_lvl, axis=0)
    R = anchors_all.shape[0]
    print(f"# total anchors {R}", file=sys.stderr)

    lab_fn = jax.jit(lambda k, g: rpn_lib.label_and_sample_anchors(
        k, anchors_all, g, cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
        cfg.MODEL.RPN.POSITIVE_FRACTION,
        list(cfg.MODEL.RPN.IOU_THRESHOLDS), [0, 1], 0.5))
    measure("rpn_label", lambda: jnp.sum(lab_fn(key, gt).labels))

    lab = jax.device_get(lab_fn(key, gt))
    lab = rpn_lib.RPNLabels(*[jnp.asarray(x) for x in lab])
    logits = jnp.asarray(rng.normal(size=(B, R)).astype(np.float32))
    deltas = jnp.asarray(rng.normal(size=(B, R, 4)).astype(np.float32) * 0.1)
    loss_fn = jax.jit(lambda lg, dl: sum(rpn_lib.rpn_losses(
        anchors_all, lg, dl, lab,
        cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE).values()))
    measure("rpn_loss", lambda: loss_fn(logits, deltas))

    # --- proposal selection (per-level topk + NMS + global topk) ---------
    logits_lvl = [jnp.asarray(rng.normal(size=(B, hw * hw * n_anchor))
                              .astype(np.float32), dtype=dt) for hw in sizes]
    deltas_lvl = [jnp.asarray((rng.normal(size=(B, hw * hw * n_anchor, 4)) * .1)
                              .astype(np.float32), dtype=dt) for hw in sizes]
    sel_fn = jax.jit(lambda ls, ds: select_sum(ls, ds))

    def select_sum(ls, ds):
        props = rpn_lib.select_proposals(
            anchors_lvl, ls, ds, batch["image_wh"][0],
            cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
            cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
            cfg.MODEL.RPN.NMS_THRESH)
        return jnp.sum(props.boxes) + jnp.sum(props.scores)
    measure("select_props", lambda: sel_fn(logits_lvl, deltas_lvl))

    # --- proposal labeling ------------------------------------------------
    P = cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN
    props = Proposals(
        boxes=jnp.asarray(rng.uniform(0, S - 1, (B, P, 4)).astype(np.float32)),
        scores=jnp.asarray(rng.normal(size=(B, P)).astype(np.float32)),
        valid=jnp.ones((B, P), bool))
    roi_lab_fn = jax.jit(lambda k: label_and_sample_proposals(
        k, props, gt, 38, cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
        cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
        list(cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS)))
    measure("roi_label", lambda: jnp.sum(roi_lab_fn(key).boxes))

    # --- ROIAlign (train gather path) ------------------------------------
    from weakcube_tpu.ops.roi_align import multilevel_roi_align
    Sroi = cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
    rboxes = jnp.asarray(rng.uniform(5, S - 5, (B, Sroi, 2)))
    rwh = jnp.asarray(rng.uniform(10, 120, (B, Sroi, 2)))
    rboxes = jnp.concatenate([rboxes - rwh / 2, rboxes + rwh / 2], -1) \
        .astype(jnp.float32)
    pool_fn = jax.jit(lambda fs, bx: jnp.sum(multilevel_roi_align(
        fs, bx, (4, 8, 16, 32, 64), 7, 2).astype(jnp.float32)))
    measure("box_pool", lambda: pool_fn(feats, rboxes))

    # --- box head ---------------------------------------------------------
    from weakcube_tpu.models.fast_rcnn import (FastRCNNConvFCHead,
                                               FastRCNNPredictor)
    pooled = jnp.asarray(rng.normal(size=(B, Sroi, 7, 7, 256))
                         .astype(np.float32), dtype=dt)
    bh = FastRCNNConvFCHead(cfg.MODEL.ROI_BOX_HEAD.NUM_FC,
                            cfg.MODEL.ROI_BOX_HEAD.FC_DIM, dt)
    bp = FastRCNNPredictor(38, dt)
    bhp = bh.init(key, pooled)
    x0 = bh.apply(bhp, pooled)
    bpp = bp.init(key, x0)

    def box_head_fn(p1, p2, x):
        h = bh.apply(p1, x)
        scores, ds = bp.apply(p2, h)
        return jnp.sum(scores.astype(jnp.float32)) + \
            jnp.sum(ds.astype(jnp.float32))
    jb = jax.jit(box_head_fn)
    measure("box_head", lambda: jb(bhp, bpp, pooled))

    # --- cube pool + head (fg prefix 128) --------------------------------
    from weakcube_tpu.models.cube_head import CubeHead
    Sfg = int(Sroi * cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION)
    cboxes = rboxes[:, :Sfg]
    ch = CubeHead(num_classes=38, num_fc=cfg.MODEL.ROI_CUBE_HEAD.NUM_FC,
                  fc_dim=cfg.MODEL.ROI_CUBE_HEAD.FC_DIM,
                  shared_fc=cfg.MODEL.ROI_CUBE_HEAD.SHARED_FC,
                  pose_type=cfg.MODEL.ROI_CUBE_HEAD.POSE_TYPE,
                  cluster_bins=cfg.MODEL.ROI_CUBE_HEAD.CLUSTER_BINS,
                  use_confidence=cfg.MODEL.ROI_CUBE_HEAD.USE_CONFIDENCE,
                  dtype=dt)
    cpooled0 = multilevel_roi_align(feats, cboxes, (4, 8, 16, 32, 64), 7, 2)
    chp = ch.init(key, cpooled0)

    def cube_fn(p, fs, bx):
        pooled = multilevel_roi_align(fs, bx, (4, 8, 16, 32, 64), 7, 2)
        outs = ch.apply(p, pooled)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
    jc = jax.jit(cube_fn)
    measure("cube_pool_head", lambda: jc(chp, feats, cboxes))

    for k, v in results.items():
        print(json.dumps({"metric": f"fwd_part_{k}",
                          "value": round(v * 1e3, 1), "unit": "ms"}))
    other = None
    print(json.dumps({"metric": "fwd_part_sum",
                      "value": round(sum(results.values()) * 1e3, 1),
                      "unit": "ms"}))


if __name__ == "__main__":
    main()
