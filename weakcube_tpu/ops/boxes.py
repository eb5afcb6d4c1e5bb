"""2D box ops: IoU/GIoU/IoA, box-delta transforms, clipping — pure JAX.

Replaces the detectron2/torchvision box utilities the reference leans on
(detectron2.structures.Boxes / pairwise_iou / pairwise_ioa,
detectron2.modeling.box_regression.Box2BoxTransform,
torchvision.ops.generalized_box_iou_loss used at
cubercnn/modeling/roi_heads/roi_heads.py:977-978, and the numpy/torch IoU in
cubercnn/util/math_util.py:1001-1118).

Boxes are XYXY float arrays of shape (..., 4) unless stated otherwise.
Everything broadcasts, is mask-friendly (degenerate boxes give 0 area, not
NaN), and vmaps cleanly.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

_SCALE_CLAMP = math.log(1000.0 / 16.0)  # d2 default delta clamp


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def xywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [b[..., 0], b[..., 1], b[..., 0] + b[..., 2], b[..., 1] + b[..., 3]], axis=-1)


def xyxy_to_xywh(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [b[..., 0], b[..., 1], b[..., 2] - b[..., 0], b[..., 3] - b[..., 1]], axis=-1)


def clip_boxes(boxes: jnp.ndarray, im_wh) -> jnp.ndarray:
    """Clip XYXY boxes into [0, W] x [0, H]. im_wh: (..., 2) or tuple."""
    w, h = im_wh[..., 0:1], im_wh[..., 1:2]
    x1 = jnp.clip(boxes[..., 0:1], 0.0, w)
    y1 = jnp.clip(boxes[..., 1:2], 0.0, h)
    x2 = jnp.clip(boxes[..., 2:3], 0.0, w)
    y2 = jnp.clip(boxes[..., 3:4], 0.0, h)
    return jnp.concatenate([x1, y1, x2, y2], axis=-1)


def _pairwise_intersection(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Intersection areas between all pairs: a (N, 4), b (M, 4) -> (N, M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M) IoU; 0 where either box is empty."""
    inter = _pairwise_intersection(a, b)
    union = area(a)[:, None] + area(b)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def pairwise_ioa(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Intersection over the area of b: (N, M). Used for ignore-region
    matching (rpn.py:93-105)."""
    inter = _pairwise_intersection(a, b)
    ab = area(b)[None, :]
    return jnp.where(ab > 0, inter / jnp.maximum(ab, 1e-12), 0.0)


def elementwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Matched IoU for aligned box arrays (..., 4) (rpn.py:330-354)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(a) + area(b) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def giou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise generalised IoU for aligned (..., 4) boxes."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(a) + area(b) - inter
    iou = inter / jnp.maximum(union, eps)
    # smallest enclosing box
    lt_c = jnp.minimum(a[..., :2], b[..., :2])
    rb_c = jnp.maximum(a[..., 2:], b[..., 2:])
    wh_c = jnp.maximum(rb_c - lt_c, 0.0)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / jnp.maximum(area_c, eps)


def giou_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 - GIoU, the torchvision `generalized_box_iou_loss` with
    reduction='none' (roi_heads.py:977-978 passes (gt, pred))."""
    return 1.0 - giou(pred, target)


# --------------------------------------------------------------------------
# Box2BoxTransform (detectron2 semantics, used by the RPN and box head)
# --------------------------------------------------------------------------

def get_deltas(src: jnp.ndarray, target: jnp.ndarray,
               weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Regression targets (dx, dy, dw, dh) from src to target boxes."""
    sw = src[..., 2] - src[..., 0]
    sh = src[..., 3] - src[..., 1]
    scx = src[..., 0] + 0.5 * sw
    scy = src[..., 1] + 0.5 * sh
    tw = target[..., 2] - target[..., 0]
    th = target[..., 3] - target[..., 1]
    tcx = target[..., 0] + 0.5 * tw
    tcy = target[..., 1] + 0.5 * th
    wx, wy, ww, wh = weights
    sw = jnp.maximum(sw, 1e-6)
    sh = jnp.maximum(sh, 1e-6)
    return jnp.stack(
        [
            wx * (tcx - scx) / sw,
            wy * (tcy - scy) / sh,
            ww * jnp.log(jnp.maximum(tw, 1e-6) / sw),
            wh * jnp.log(jnp.maximum(th, 1e-6) / sh),
        ],
        axis=-1,
    )


def apply_deltas(deltas: jnp.ndarray, boxes: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Apply (dx, dy, dw, dh) deltas to boxes; dw/dh clamped as in d2."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, _SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, _SCALE_CLAMP)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    return jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 0.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (fvcore semantics; beta=0 -> pure L1)."""
    diff = jnp.abs(pred - target)
    if beta <= 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def mask_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between boolean masks over the last two axes
    (ProposalNetwork/utils/utils.py:225)."""
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    inter = jnp.sum(af * bf, axis=(-2, -1))
    union = jnp.sum(jnp.maximum(af, bf), axis=(-2, -1))
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
