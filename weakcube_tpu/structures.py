"""Dense, static-shape batch structures.

The reference passes detectron2 `Instances` objects with per-image dynamic
lengths through the whole stack. On TPU, dynamic shapes force recompilation
and block fusion, so every collection here is a fixed-capacity
struct-of-arrays with a validity mask, batched over images:

  GroundTruth   (B, G, ...)  padded GT annotations from the data layer
  Proposals     (B, P, ...)  RPN outputs (P = POST_NMS_TOPK)
  SampledRois   (B, S, ...)  matched+subsampled RoIs for the heads
  Detections    (B, D, ...)  final per-image detections

All are NamedTuples => automatically pytrees (jit/vmap/scan safe).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class GroundTruth(NamedTuple):
    """Padded ground-truth annotations for a batch of images.

    classes: >= 0 real category, -1 = ignore region (reference encodes
    ignore GTs as gt_classes == -1, rpn.py:47-48). `valid` marks live rows.
    boxes3D layout follows DatasetMapper3D (dataset_mapper.py:250-272):
    [proj_cx, proj_cy, z, w, h, l, cx3d, cy3d, cz3d].
    """

    boxes: jnp.ndarray          # (B, G, 4) XYXY at network resolution
    classes: jnp.ndarray        # (B, G) int32
    valid: jnp.ndarray          # (B, G) bool
    boxes3D: Optional[jnp.ndarray] = None   # (B, G, 9)
    poses: Optional[jnp.ndarray] = None     # (B, G, 3, 3)

    @property
    def is_fg(self):
        return self.valid & (self.classes >= 0)

    @property
    def is_ignore(self):
        return self.valid & (self.classes < 0)


class Proposals(NamedTuple):
    boxes: jnp.ndarray          # (B, P, 4)
    scores: jnp.ndarray         # (B, P) objectness logits
    valid: jnp.ndarray          # (B, P) bool


class SampledRois(NamedTuple):
    """RoIs after matching/subsampling for head training.

    gt_idx points into the GroundTruth arrays of the same image.
    fg marks foreground samples; valid marks live (sampled) rows.
    """

    boxes: jnp.ndarray          # (B, S, 4)
    classes: jnp.ndarray        # (B, S) matched class (num_classes = BG)
    gt_idx: jnp.ndarray         # (B, S) int32
    fg: jnp.ndarray             # (B, S) bool
    valid: jnp.ndarray          # (B, S) bool


class Detections(NamedTuple):
    boxes: jnp.ndarray          # (B, D, 4)
    scores: jnp.ndarray         # (B, D)
    classes: jnp.ndarray        # (B, D)
    valid: jnp.ndarray          # (B, D)
    scores_full: Optional[jnp.ndarray] = None  # (B, D, C+1) full softmax
    # 3D outputs (inference): filled by the cube head
    centers3D: Optional[jnp.ndarray] = None    # (B, D, 3)
    dims3D: Optional[jnp.ndarray] = None       # (B, D, 3)
    poses3D: Optional[jnp.ndarray] = None      # (B, D, 3, 3)
    scores3D: Optional[jnp.ndarray] = None     # (B, D) 3D confidence


def match_boxes(iou_matrix: jnp.ndarray, gt_valid: jnp.ndarray,
                thresholds, labels):
    """detectron2 `Matcher` semantics on a (G, R) quality matrix.

    Args:
      iou_matrix: (G, R) match quality; rows of invalid GTs must be ignored.
      gt_valid: (G,) bool.
      thresholds: ascending list, e.g. [0.3, 0.7].
      labels: len(thresholds)+1 values from {-1, 0, 1} per interval.
    Returns:
      (matched_idx (R,), matched_vals (R,), match_labels (R,) int32)
    """
    q = jnp.where(gt_valid[:, None], iou_matrix, -1.0)
    matched_idx = jnp.argmax(q, axis=0)
    matched_vals = jnp.max(q, axis=0)
    match_labels = jnp.full(matched_vals.shape, labels[0], dtype=jnp.int32)
    for lo, lab in zip(thresholds, labels[1:]):
        match_labels = jnp.where(matched_vals >= lo, lab, match_labels)
    # no valid gt at all -> everything background
    any_gt = jnp.any(gt_valid)
    match_labels = jnp.where(any_gt, match_labels, labels[0])
    matched_vals = jnp.where(any_gt, jnp.maximum(matched_vals, 0.0), 0.0)
    return matched_idx, matched_vals, match_labels
