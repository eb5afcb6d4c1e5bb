"""2D box head + predictor + losses + static-shape inference.

Re-design of the reference FastRCNN pieces
(cubercnn/modeling/roi_heads/fast_rcnn.py):
  * FastRCNNConvFCHead: flattened RoI features -> 2x FC(1024) (configured by
    MODEL.ROI_BOX_HEAD.NUM_FC / FC_DIM).
  * losses (fast_rcnn.py:145-194): CE averaged over all sampled RoIs +
    class-specific smooth-L1 summed over FG and normalised by the total
    sample count.
  * inference (fast_rcnn.py:57-116): score threshold -> per-class NMS ->
    top-k, retaining `scores_full` (the full softmax row) for the cube
    head's 3D scoring — here with a fixed candidate budget instead of
    dynamic nonzero() gathers.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import boxes as box_ops
from ..ops import losses as loss_ops
from ..ops import nms as nms_ops
from ..structures import Detections, Proposals, SampledRois


class FastRCNNConvFCHead(nn.Module):
    num_fc: int = 2
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (..., 7, 7, C) pooled features
        x = x.reshape(x.shape[:-3] + (-1,))
        for i in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name=f"fc{i + 1}")(x))
        return x


class FastRCNNPredictor(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.001),
                          name="bbox_pred")(x)
        return scores, deltas


def fast_rcnn_losses(scores: jnp.ndarray, deltas: jnp.ndarray,
                     rois: SampledRois, gt_boxes_matched: jnp.ndarray,
                     num_classes: int,
                     box_reg_weights=(10.0, 10.0, 5.0, 5.0),
                     smooth_l1_beta: float = 0.0):
    """Masked Fast R-CNN losses over (B, S) sampled RoIs.

    gt_boxes_matched: (B, S, 4) GT box per sampled RoI (garbage on BG rows).
    """
    valid = rois.valid
    fg = rois.fg & valid
    # CE with BG = num_classes label on non-fg rows
    labels = jnp.where(fg, rois.classes, num_classes)
    ce = loss_ops.softmax_cross_entropy(scores, labels)
    loss_cls = loss_ops.masked_mean(ce, valid)

    B, S = labels.shape
    d = deltas.reshape(B, S, num_classes, 4)
    cls_idx = jnp.clip(rois.classes, 0, num_classes - 1)
    d_fg = jnp.take_along_axis(d, cls_idx[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
    gt_d = box_ops.get_deltas(rois.boxes, gt_boxes_matched, box_reg_weights)
    reg = box_ops.smooth_l1(d_fg, gt_d, smooth_l1_beta).sum(-1)
    normalize = jnp.maximum(jnp.sum(valid), 1.0)
    loss_reg = jnp.sum(jnp.where(fg, reg, 0.0)) / normalize
    return {"BoxHead/loss_cls": loss_cls, "BoxHead/loss_box_reg": loss_reg}


def predict_boxes(deltas: jnp.ndarray, proposal_boxes: jnp.ndarray,
                  num_classes: int, box_reg_weights=(10.0, 10.0, 5.0, 5.0)):
    """Apply per-class deltas: (B, P, 4C) + (B, P, 4) -> (B, P, C, 4)."""
    B, P = proposal_boxes.shape[:2]
    d = deltas.reshape(B, P, num_classes, 4)
    return box_ops.apply_deltas(d, proposal_boxes[:, :, None, :], box_reg_weights)


def fast_rcnn_inference(scores: jnp.ndarray, boxes_per_class: jnp.ndarray,
                        proposals: Proposals, image_wh: jnp.ndarray,
                        score_thresh: float, nms_thresh: float,
                        topk_per_image: int,
                        candidate_topk: int = 1024) -> Detections:
    """Static-shape per-class NMS inference.

    scores: (B, P, C+1) logits; boxes_per_class: (B, P, C, 4).
    Candidates are the global top `candidate_topk` (roi, class) pairs above
    the score threshold (fixed budget instead of dynamic nonzero()).
    """
    B, P, C1 = scores.shape
    C = C1 - 1
    probs = jax.nn.softmax(scores, axis=-1)

    def per_image(probs_i, boxes_i, pvalid, wh):
        cls_probs = probs_i[:, :C]                      # (P, C)
        cls_probs = jnp.where(pvalid[:, None], cls_probs, 0.0)
        flat = cls_probs.reshape(-1)                    # (P*C,)
        k = min(candidate_topk, flat.shape[0])
        top_p, flat_idx = jax.lax.top_k(flat, k)
        roi_idx = flat_idx // C
        cls_idx = flat_idx % C
        cand_boxes = box_ops.clip_boxes(boxes_i[roi_idx, cls_idx], wh)
        # drop non-finite candidates (reference fast_rcnn.py:76-79)
        finite = jnp.all(jnp.isfinite(cand_boxes), -1) & jnp.isfinite(top_p)
        cand_valid = (top_p > score_thresh) & finite
        keep = nms_ops.batched_nms_mask(cand_boxes, top_p, cls_idx, nms_thresh,
                                        valid=cand_valid)
        bk, sk, vk, sel = nms_ops.topk_after_nms(cand_boxes, top_p, keep, topk_per_image)
        ck = jnp.where(vk, cls_idx[sel], -1)
        full = probs_i[:, :C][roi_idx[sel]]             # (D, C) softmax rows
        roi_sel = roi_idx[sel]
        return bk, jnp.where(vk, sk, 0.0), ck, vk, full, roi_sel

    wh = jnp.broadcast_to(image_wh, (B, 2))
    bk, sk, ck, vk, full, roi_sel = jax.vmap(per_image)(
        probs, boxes_per_class, proposals.valid, wh)
    det = Detections(boxes=bk, scores=sk, classes=ck, valid=vk, scores_full=full)
    return det, roi_sel
