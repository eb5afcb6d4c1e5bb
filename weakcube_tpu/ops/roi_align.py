"""ROIAlignV2 over an FPN pyramid — pure-XLA gather formulation.

TPU-native replacement for detectron2's CUDA `ROIAlignV2` pooler
(reference: cubercnn/modeling/roi_heads/roi_heads.py:191-196,324,738 and
config POOLER_TYPE "ROIAlignV2").

Design (static shapes, single fused gather):
  * The FPN levels are flattened and concatenated into ONE (B, sum_l H_l*W_l, C)
    buffer. Each RoI is assigned a pyramid level by the detectron2 heuristic
    (level = floor(canonical + log2(sqrt(area)/224))), and its bilinear
    sample indices are computed against that level's geometry plus the
    level's flat offset. One `take_along_axis` gather then pools every RoI
    from its own level — no 5x duplicated compute, no ragged shapes.
  * ROIAlign *V2* semantics: `aligned=True`, i.e. a -0.5 pixel offset so
    sample coordinates are pixel-centre aligned.
  * sampling_ratio is fixed (default 2 -> 2x2 samples per bin, average
    pooled). The reference uses adaptive sampling_ratio=0; a fixed ratio is
    the standard XLA-friendly choice and matches within interpolation noise
    for typical RoI sizes.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def assign_fpn_levels(boxes: jnp.ndarray, min_level: int, max_level: int,
                      canonical_level: int = 4,
                      canonical_size: float = 224.0) -> jnp.ndarray:
    """detectron2 `assign_boxes_to_levels`: (..., 4) XYXY -> level index
    (int32 in [min_level, max_level])."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    scale = jnp.sqrt(w * h)
    lvl = jnp.floor(canonical_level + jnp.log2(scale / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Sequence[int],
    output_size: int = 7,
    sampling_ratio: int = 2,
    min_level: int = 2,
) -> jnp.ndarray:
    """ROIAlignV2 over a feature pyramid.

    Args:
      features: list of NHWC maps, finest first, e.g. [P2, P3, P4, P5, P6]
        with shapes (B, H_l, W_l, C).
      boxes: (B, R, 4) XYXY in input-image coordinates (padded RoIs fine —
        degenerate boxes just pool garbage; callers mask downstream).
      strides: stride of each level w.r.t. the input image, e.g. (4, 8, ...).
      output_size: pooled spatial size (7 -> 7x7).
      sampling_ratio: samples per bin edge (2 -> 2x2 averaged per bin).
      min_level: pyramid level index of features[0].
    Returns:
      (B, R, output_size, output_size, C) pooled features.
    """
    B, R, _ = boxes.shape
    C = features[0].shape[-1]
    n_lvl = len(features)
    max_level = min_level + n_lvl - 1

    # ---- flatten pyramid into one gather source -------------------------
    flats, offsets, heights, widths = [], [], [], []
    off = 0
    for f in features:
        _, H, W, _ = f.shape
        flats.append(f.reshape(B, H * W, C))
        offsets.append(off)
        heights.append(H)
        widths.append(W)
        off += H * W
    flat = jnp.concatenate(flats, axis=1)            # (B, sumHW, C)
    offsets = jnp.asarray(offsets, jnp.int32)        # (L,)
    heights = jnp.asarray(heights, jnp.int32)
    widths = jnp.asarray(widths, jnp.int32)
    inv_strides = jnp.asarray([1.0 / s for s in strides], jnp.float32)

    levels = assign_fpn_levels(boxes, min_level, max_level) - min_level  # (B,R)
    lvl_off = offsets[levels]        # (B, R)
    lvl_h = heights[levels]
    lvl_w = widths[levels]
    lvl_scale = inv_strides[levels]  # (B, R)

    # ---- sample coordinates (V2: aligned, -0.5 offset) ------------------
    x1 = boxes[..., 0] * lvl_scale - 0.5
    y1 = boxes[..., 1] * lvl_scale - 0.5
    x2 = boxes[..., 2] * lvl_scale - 0.5
    y2 = boxes[..., 3] * lvl_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1e-6)

    S = sampling_ratio
    P = output_size * S  # sample grid edge
    # sample centres: (b, r, p) -> coordinate
    grid = (jnp.arange(P, dtype=jnp.float32) + 0.5) / P  # in [0, 1]
    sx = x1[..., None] + roi_w[..., None] * grid          # (B, R, P)
    sy = y1[..., None] + roi_h[..., None] * grid          # (B, R, P)

    # bilinear neighbours, clamped to the level bounds
    def _prep(coord, size):
        c = jnp.clip(coord, 0.0, size[..., None].astype(jnp.float32) - 1.0)
        lo = jnp.floor(c)
        frac = c - lo
        lo = lo.astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size[..., None] - 1)
        return lo, hi, frac

    x_lo, x_hi, fx = _prep(sx, lvl_w)  # (B, R, P)
    y_lo, y_hi, fy = _prep(sy, lvl_h)

    # Accumulate the 4 bilinear corners one at a time: materialising the
    # stacked (B, R, 4, P, P, C) tensor costs ~10 GB at recipe scale
    # (b25 x 512 RoIs x 14x14 x 256ch) and OOMs a v5e; the running sum
    # peaks at ~2 gathers instead. Gathers stay in the feature dtype
    # (bf16 halves the traffic); the weighted sum accumulates in fp32.
    def flat_idx(yy, xx):
        # yy: (B, R, P) over rows ; xx: (B, R, P) over cols -> (B, R, P, P)
        return (lvl_off[..., None, None]
                + yy[..., :, None] * lvl_w[..., None, None]
                + xx[..., None, :])

    dt = flat.dtype  # stay in the feature dtype (bf16 halves peak HBM)
    samples = jnp.zeros((B, R, P, P, C), dt)
    corners = [
        (y_lo, x_lo, (1.0 - fy), (1.0 - fx)),
        (y_lo, x_hi, (1.0 - fy), fx),
        (y_hi, x_lo, fy, (1.0 - fx)),
        (y_hi, x_hi, fy, fx),
    ]
    for yy, xx, wy, wx in corners:
        idx = flat_idx(yy, xx).reshape(B, R * P * P)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)
        g = g.reshape(B, R, P, P, C)
        w = (wy[..., :, None] * wx[..., None, :])[..., None].astype(dt)
        samples = samples + g * w

    # average-pool S x S samples per output bin
    pooled = samples.reshape(B, R, output_size, S, output_size, S, C)
    return jnp.mean(pooled, axis=(3, 5))
