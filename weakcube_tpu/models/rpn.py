"""RPN with ignore-region handling and IoUness objectness — flax + pure JAX.

TPU-native re-design of the reference `RPNWithIgnore`
(cubercnn/modeling/proposal_generator/rpn.py):
  * label_and_sample_anchors (rpn.py:43-110): matcher + IoU-weighted
    subsampling + best-anchor-per-GT forcing + IoA ignore regions — here one
    vmapped, mask-based function (no per-image Python loop).
  * IoUness losses (rpn.py:129-273): BCE of objectness toward the matched
    IoU and IoU-weighted smooth-L1 box regression, both normalised by
    batch_size_per_image * num_images.
  * proposal selection (d2 find_top_rpn_proposals): per-level pre-NMS top-k,
    per-level NMS (levels never suppress each other), global post-NMS top-k
    into a FIXED-size Proposals struct.

Everything downstream consumes (B, P) dense arrays + validity masks.
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import boxes as box_ops
from ..ops import losses as loss_ops
from ..ops import nms as nms_ops
from ..ops import sampling
from ..structures import GroundTruth, Proposals, match_boxes


class RPNHead(nn.Module):
    """Standard RPN head: shared 3x3 conv -> 1x1 objectness + 1x1 deltas."""

    num_anchors: int
    conv_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        conv = nn.Conv(self.conv_dim, (3, 3), padding=1, dtype=self.dtype, name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="objectness")
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="deltas")
        logits, regs = [], []
        for f in feats:
            t = nn.relu(conv(f))
            B, H, W, _ = t.shape
            logits.append(obj(t).reshape(B, H * W * self.num_anchors))
            regs.append(deltas(t).reshape(B, H * W * self.num_anchors, 4))
        return logits, regs


class RPNLabels(NamedTuple):
    labels: jnp.ndarray        # (B, R) in {-1 ignore, 0 bg, 1 fg}
    matched_boxes: jnp.ndarray  # (B, R, 4) matched GT box per anchor
    matched_ious: jnp.ndarray  # (B, R) IoU with matched GT


def label_and_sample_anchors(key: jax.Array, anchors: jnp.ndarray,
                             gt: GroundTruth, batch_size_per_image: int,
                             positive_fraction: float,
                             iou_thresholds: Sequence[float],
                             iou_labels: Sequence[int],
                             ignore_threshold: float) -> RPNLabels:
    """Batched anchor labelling (vmap over images). anchors: (R, 4)."""

    def per_image(key, gt_boxes, gt_classes, gt_valid):
        fg_gt = gt_valid & (gt_classes >= 0)
        ign_gt = gt_valid & (gt_classes < 0)

        iou = box_ops.pairwise_iou(gt_boxes, anchors)          # (G, R)
        matched_idx, matched_vals, labels = match_boxes(iou, fg_gt,
                                                        iou_thresholds, iou_labels)
        # best anchor for each GT that already clears the fg threshold is
        # force-kept as positive (rpn.py:75-84)
        iou_fg = jnp.where(fg_gt[:, None], iou, -1.0)
        best_anchor_per_gt = jnp.argmax(iou_fg, axis=1)        # (G,)
        forced = jnp.zeros(anchors.shape[0], bool).at[best_anchor_per_gt].set(
            fg_gt & (labels[best_anchor_per_gt] == 1))

        # IoU-weighted subsampling of positives and negatives (rpn.py:275-328)
        is_pos = labels == 1
        is_neg = labels == 0
        k1, k2 = jax.random.split(key)
        n_pos_budget = int(batch_size_per_image * positive_fraction)
        pos_mask = sampling.gumbel_topk_mask(
            k1, jnp.log(matched_vals + 1e-4), is_pos, n_pos_budget)
        n_pos = jnp.sum(pos_mask)
        # negatives fill the remaining budget, IoU-weighted too. Cutting the
        # gumbel scores at the budget-th largest (rank_budget_mask) avoids a
        # full ~65k-anchor bitonic sort per image on TPU.
        g = jax.random.gumbel(k2, is_neg.shape) + jnp.log(matched_vals + 1e-4)
        neg_budget = jnp.maximum(batch_size_per_image - n_pos, 0)
        neg_mask = sampling.rank_budget_mask(g, is_neg, neg_budget,
                                             batch_size_per_image)

        final = jnp.full(labels.shape, -1, jnp.int32)
        final = jnp.where(neg_mask, 0, final)
        final = jnp.where(pos_mask | forced, 1, final)

        # ignore regions: bg anchors covered by an ignore GT -> -1 (rpn.py:93-105)
        ioa = box_ops.pairwise_ioa(gt_boxes, anchors)          # IoA w.r.t anchors
        ioa = jnp.where(ign_gt[:, None], ioa, 0.0)
        in_ignore = jnp.max(ioa, axis=0) >= ignore_threshold
        final = jnp.where((final == 0) & in_ignore, -1, final)

        matched_boxes = gt_boxes[matched_idx]
        return final, matched_boxes, matched_vals

    keys = jax.random.split(key, gt.boxes.shape[0])
    labels, mboxes, mious = jax.vmap(per_image)(keys, gt.boxes, gt.classes, gt.valid)
    return RPNLabels(labels, mboxes, mious)


def rpn_losses(anchors: jnp.ndarray, logits: jnp.ndarray, deltas: jnp.ndarray,
               lab: RPNLabels, batch_size_per_image: int,
               box_reg_weights=(1.0, 1.0, 1.0, 1.0),
               smooth_l1_beta: float = 0.0) -> Dict[str, jnp.ndarray]:
    """IoUness RPN losses (rpn.py:206-273). All (B, R) dense + masks."""
    B = logits.shape[0]
    fg = lab.labels == 1

    # objectness targets: IoU of anchor with its matched GT box
    iou_t = jax.lax.stop_gradient(
        box_ops.elementwise_iou(jnp.broadcast_to(anchors, lab.matched_boxes.shape),
                                lab.matched_boxes))
    conf = loss_ops.bce_with_logits(logits, iou_t)
    loss_conf = jnp.sum(jnp.where(fg, conf * iou_t, 0.0))

    gt_deltas = box_ops.get_deltas(jnp.broadcast_to(anchors, lab.matched_boxes.shape),
                                   lab.matched_boxes, box_reg_weights)
    reg = box_ops.smooth_l1(deltas, gt_deltas, smooth_l1_beta).sum(-1)
    loss_reg = jnp.sum(jnp.where(fg, reg * iou_t, 0.0))

    normalizer = batch_size_per_image * B
    return {"rpn/cls": loss_conf / normalizer, "rpn/loc": loss_reg / normalizer}


def select_proposals(anchors_per_level: List[jnp.ndarray],
                     logits_per_level: List[jnp.ndarray],
                     deltas_per_level: List[jnp.ndarray],
                     image_wh: jnp.ndarray,
                     pre_nms_topk: int, post_nms_topk: int,
                     nms_thresh: float,
                     box_reg_weights=(1.0, 1.0, 1.0, 1.0),
                     approx_topk: bool = True) -> Proposals:
    """d2 find_top_rpn_proposals with static shapes.

    Per level: top-k by objectness -> decode -> clip -> NMS (within level
    only, matching batched_nms over level ids) -> global top-k. The pre-NMS
    selection uses the TPU-optimised `approx_max_k` by default (recall
    ~0.95+): exact pre-NMS ordering is immaterial since NMS and the global
    post-NMS top-k re-rank the survivors.
    """
    def per_image(logits_l, deltas_l, wh):
        all_boxes, all_scores, all_valid = [], [], []
        for anchors, logit, delta in zip(anchors_per_level, logits_l, deltas_l):
            k = min(pre_nms_topk, logit.shape[0])
            if approx_topk and k < logit.shape[0]:
                top_scores, idx = jax.lax.approx_max_k(logit, k)
            else:
                top_scores, idx = jax.lax.top_k(logit, k)
            boxes = box_ops.apply_deltas(delta[idx], anchors[idx], box_reg_weights)
            boxes = box_ops.clip_boxes(boxes, wh)
            keep = nms_ops.nms_mask(boxes, top_scores, nms_thresh)
            all_boxes.append(boxes)
            all_scores.append(jnp.where(keep, top_scores, nms_ops.NEG_INF))
            all_valid.append(keep)
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        valid = jnp.concatenate(all_valid)
        b, s, v, _ = nms_ops.topk_after_nms(boxes, scores, valid, post_nms_topk)
        return b, s, v

    # vmap over batch: logits/deltas are lists of (B, R_l, ...) arrays
    B = logits_per_level[0].shape[0]
    b, s, v = jax.vmap(per_image)(
        [l for l in logits_per_level], [d for d in deltas_per_level],
        jnp.broadcast_to(image_wh, (B, 2)))
    return Proposals(boxes=b, scores=s, valid=v)
