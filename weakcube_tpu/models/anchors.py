"""Multi-level anchor generation (detectron2 DefaultAnchorGenerator semantics).

The reference uses d2's anchor generator with SIZES [[32],[64],[128],[256],
[512]] and ASPECT_RATIOS [[0.5, 1.0, 2.0]] over p2..p6 (configs/Base.yaml).
Anchors depend only on static feature shapes, so they are computed once at
trace time as constants — no runtime cost.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def cell_anchors(sizes: Sequence[float], aspect_ratios: Sequence[float]) -> np.ndarray:
    """(len(sizes)*len(ratios), 4) XYXY anchors centred at the origin."""
    out = []
    for size in sizes:
        area = float(size) ** 2
        for ar in aspect_ratios:
            w = math.sqrt(area / ar)
            h = ar * w
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, dtype=np.float32)


def grid_anchors(feat_hw: Tuple[int, int], stride: int,
                 cells: np.ndarray, offset: float = 0.0) -> np.ndarray:
    """Anchors for one level: (H*W*A, 4), row-major over (y, x, anchor)."""
    H, W = feat_hw
    shifts_x = (np.arange(W, dtype=np.float32) + offset) * stride
    shifts_y = (np.arange(H, dtype=np.float32) + offset) * stride
    sx, sy = np.meshgrid(shifts_x, shifts_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    anchors = shifts[:, None, :] + cells[None, :, :]
    return anchors.reshape(-1, 4)


def pyramid_anchors(feat_shapes: Sequence[Tuple[int, int]],
                    strides: Sequence[int],
                    sizes_per_level: Sequence[Sequence[float]],
                    aspect_ratios: Sequence[Sequence[float]],
                    offset: float = 0.0) -> List[jnp.ndarray]:
    """Anchors for every pyramid level as device constants.

    `aspect_ratios` broadcasts (a single list applies to all levels, as in
    the reference config).
    """
    L = len(feat_shapes)
    if len(aspect_ratios) == 1:
        aspect_ratios = list(aspect_ratios) * L
    if len(sizes_per_level) == 1:
        sizes_per_level = list(sizes_per_level) * L
    out = []
    for (hw, stride, sizes, ars) in zip(feat_shapes, strides, sizes_per_level, aspect_ratios):
        cells = cell_anchors(sizes, ars)
        out.append(jnp.asarray(grid_anchors(hw, stride, cells, offset)))
    return out
