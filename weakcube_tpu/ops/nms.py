"""Static-shape NMS for XLA — replaces torchvision `batched_nms`
(used by the reference RPN proposal selection and 2D inference,
cubercnn/modeling/roi_heads/fast_rcnn.py:105, rcnn3d.py:225).

On TPU, dynamic output sizes are poison: we keep ALL boxes, compute the
N x N IoU matrix once (one big MXU-friendly batched min/max reduction), and
derive a keep *mask* with a greedy suppression sweep expressed as
`lax.scan` over score-sorted rows. Output is (keep_mask, order) — callers
take a fixed top-k afterwards, never a dynamic gather.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

NEG_INF = -1e10


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
             valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS keep-mask over N boxes (static shape).

    Args:
      boxes: (N, 4) XYXY.
      scores: (N,) — invalid boxes should carry very low scores.
      iou_threshold: suppress boxes with IoU > threshold against a kept box.
      valid: optional (N,) bool; invalid boxes are never kept.
    Returns:
      keep: (N,) bool mask in the ORIGINAL box order.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores)  # descending
    sboxes = boxes[order]
    svalid = valid[order]

    iou = pairwise_iou(sboxes, sboxes)
    # strict upper-triangle mask: row j suppresses column i only if j ranks
    # higher (j < i in score order)
    earlier = jnp.arange(n)[:, None] < jnp.arange(n)[None, :]
    suppress = (iou > iou_threshold) & earlier          # (j, i)

    # Exact greedy NMS as a FIXED-POINT of matrix passes instead of an
    # N-step sequential scan (the TPU-hostile part of greedy NMS): start
    # with every valid box kept; each pass kills boxes dominated by a
    # currently-kept higher-ranked box. A box's final state is correct once
    # its suppression CHAIN depth is reached, so the loop converges in
    # max-chain-depth passes (typically < 8, worst case n) — each pass is
    # one (n, n) masked reduction on the VPU rather than n dependent steps.
    def cond(state):
        kept, prev, i = state
        return jnp.any(kept != prev) & (i < n)

    def body(state):
        kept, _, i = state
        killed = jnp.any(suppress & kept[:, None], axis=0)
        new = svalid & ~killed
        return new, kept, i + 1

    init = (svalid, ~svalid, jnp.int32(0))
    kept, _, _ = jax.lax.while_loop(cond, body, init)
    # scatter back to original order
    keep = jnp.zeros((n,), dtype=bool).at[order].set(kept)
    return keep


def batched_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                     idxs: jnp.ndarray, iou_threshold: float,
                     valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Category/level-aware NMS: boxes with different `idxs` never suppress
    each other (torchvision `batched_nms` semantics, via the standard
    coordinate-offset trick so one IoU matrix suffices)."""
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool)
    span = jnp.max(boxes) - jnp.min(boxes) + 1.0
    offsets = idxs.astype(boxes.dtype) * (span + 1.0)
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold, valid)


def topk_after_nms(boxes: jnp.ndarray, scores: jnp.ndarray, keep: jnp.ndarray,
                   k: int):
    """Select the top-k kept boxes into a fixed-size (k, ...) result.

    Returns (boxes_k, scores_k, valid_k, idx_k); slots beyond the number of
    kept boxes are marked invalid with score NEG_INF and zero boxes.
    """
    n = scores.shape[0]
    if k > n:  # pad so fixed k works with fewer candidates
        pad = k - n
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)])
        scores = jnp.concatenate([scores, jnp.full((pad,), NEG_INF, scores.dtype)])
        keep = jnp.concatenate([keep, jnp.zeros((pad,), bool)])
    masked_scores = jnp.where(keep, scores, NEG_INF)
    top_scores, idx = jax.lax.top_k(masked_scores, k)
    valid_k = top_scores > NEG_INF / 2
    boxes_k = jnp.where(valid_k[:, None], boxes[idx], 0.0)
    scores_k = jnp.where(valid_k, top_scores, NEG_INF)
    return boxes_k, scores_k, valid_k, idx
