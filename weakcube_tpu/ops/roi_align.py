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

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


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
    # peaks at ~2 gathers instead. Gathers and the weighted sum stay in the
    # feature dtype (bf16 halves the traffic; the 4-term sum loses <1 ulp).
    def flat_idx(yy, xx):
        # yy: (B, R, P) over rows ; xx: (B, R, P) over cols -> (B, R, P, P)
        return (lvl_off[..., None, None]
                + yy[..., :, None] * lvl_w[..., None, None]
                + xx[..., None, :])

    dt = flat.dtype  # stay in the feature dtype (bf16 halves peak HBM)
    # (A bf16->int32 pair-packed gather was tried to vectorize the row
    # gather — it OOMed the v5e at recipe scale: the bitcast/reshape of the
    # concatenated pyramid materializes multi-GB intermediates. The dense
    # matmul_fwd plan below is the fast path instead.)
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


# ---------------------------------------------------------------------------
# windowed scatter-add backward (shared by the XLA and Pallas trainable paths)
# ---------------------------------------------------------------------------
# ROIAlign is LINEAR in the features, so its backward is fully determined by
# the bilinear sampling plan. XLA's autodiff of the gather formulation above
# scatters the 4 corner contributions separately (4 * R * P * P update rows
# per image, ~70% of the recipe-scale backward). This plan instead emits ONE
# lax.scatter_add of (2, 2, C) bilinear blocks per sample point into a
# row-stacked per-level buffer — 4x fewer scatter rows. Correctness at
# clamped edges: when a sample clamps to the last row/col its hi-corner
# weight is exactly 0 (c = size-1 => frac = 0), so the +1 row/col writes only
# zeros — each level gets one guard row/col to absorb them, sliced off
# afterwards (FILL_OR_DROP also drops any out-of-range row defensively).


def windowed_scatter_bwd(feat_shapes, feat_dtypes, boxes, g, strides,
                         output_size: int, sampling_ratio: int,
                         min_level: int):
    """Gradient of multilevel ROIAlign w.r.t. the feature pyramid.

    feat_shapes/feat_dtypes: per-level (B, H, W, C) shapes and dtypes.
    boxes: (B, R, 4). g: (B, R, P, P, C) upstream gradient.
    Returns a tuple of per-level gradients in the feature dtypes.
    """
    B, R = boxes.shape[:2]
    C = feat_shapes[0][-1]
    feat_hw = [(s[1], s[2]) for s in feat_shapes]
    # stacked geometry: level l occupies rows [off_l, off_l + H_l) and cols
    # [0, W_l) of a (sumH + L guard rows, maxW + 1, C) buffer
    heights_g = [h + 1 for h, _ in feat_hw]
    row_offsets = np.cumsum([0] + heights_g[:-1])
    maxW = max(w for _, w in feat_hw)
    sumH = sum(heights_g)

    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1))

    def per_image(boxes_i, g_i):
        L = len(feat_hw)
        heights = jnp.asarray([h for h, w in feat_hw], jnp.int32)
        widths = jnp.asarray([w for h, w in feat_hw], jnp.int32)
        offs = jnp.asarray(row_offsets, jnp.int32)
        levels = assign_fpn_levels(boxes_i, min_level,
                                   min_level + L - 1) - min_level
        inv_strides = jnp.asarray([1.0 / s for s in strides], jnp.float32)
        scale = inv_strides[levels]
        lvl_h = heights[levels]
        lvl_w = widths[levels]
        lvl_off = offs[levels]

        x1 = boxes_i[:, 0] * scale - 0.5
        y1 = boxes_i[:, 1] * scale - 0.5
        x2 = boxes_i[:, 2] * scale - 0.5
        y2 = boxes_i[:, 3] * scale - 0.5
        roi_w = jnp.maximum(x2 - x1, 1e-6)
        roi_h = jnp.maximum(y2 - y1, 1e-6)
        P = output_size * sampling_ratio
        grid = (jnp.arange(P, dtype=jnp.float32) + 0.5) / P
        sx = x1[:, None] + roi_w[:, None] * grid
        sy = y1[:, None] + roi_h[:, None] * grid

        def prep(coord, size):
            c = jnp.clip(coord, 0.0, size[:, None].astype(jnp.float32) - 1.0)
            lo = jnp.floor(c)
            return lo.astype(jnp.int32), c - lo

        y_lo, fy = prep(sy, lvl_h)                      # (R, P)
        x_lo, fx = prep(sx, lvl_w)
        S = sampling_ratio
        gs = jnp.repeat(jnp.repeat(g_i, S, axis=1), S, axis=2) / (S * S)
        gs = gs.reshape(R, P * P, C)                    # row-major (y, x)

        # block = outer([1-fy, fy], [1-fx, fx]) x g  -> (R, P*P, 2, 2, C)
        wy = jnp.stack([1.0 - fy, fy], -1)              # (R, P, 2)
        wx = jnp.stack([1.0 - fx, fx], -1)
        w22 = (wy[:, :, None, :, None] * wx[:, None, :, None, :])  # (R,P,P,2,2)
        upd = w22.reshape(R, P * P, 2, 2, 1) * gs[:, :, None, None, :]

        rows = (lvl_off[:, None] + y_lo)[:, :, None].repeat(P, 2)  # (R, P, P)
        cols = x_lo[:, None, :].repeat(P, 1)
        idx = jnp.stack([rows.reshape(R, P * P),
                         cols.reshape(R, P * P)], -1)   # (R, P*P, 2)

        return jax.lax.scatter_add(
            jnp.zeros((sumH, maxW + 1, C), jnp.float32),
            idx.reshape(R * P * P, 2), upd.reshape(R * P * P, 2, 2, C),
            dnums, indices_are_sorted=False, unique_indices=False,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP)

    buf = jax.vmap(per_image)(boxes, g.astype(jnp.float32))
    grads = []
    for (h, w), off, dt in zip(feat_hw, row_offsets, feat_dtypes):
        grads.append(buf[:, off:off + h, :w].astype(dt))
    return tuple(grads)


# ---------------------------------------------------------------------------
# scatter-free matmul FORWARD
# ---------------------------------------------------------------------------
# The same separability that powers matmul_bwd gives a gather-free forward:
#   pooled[b,r,p,q,c] = sum_{y,x} Wy[b,r,p,y] * Wx[b,r,q,x] * feat[b,y,x,c]
# as two dense per-level contractions riding the MXU. Round-3 measurement:
# the take_along_axis gather forward costs 191 ms for the 25x512-RoI box
# pooler at 512 px (~3% of HBM bandwidth — pathological), while the dense
# form is ~2 TFLOP of MXU work (~20-30 ms). RoIs are masked per level
# through Wy and the RoI axis is chunked under lax.scan to bound the
# (B, chunk, P, W, C) intermediate, exactly like matmul_bwd.


def _level_skip_enabled(level_skip):
    import os
    env = os.environ.get("WEAKCUBE_RA_LEVEL_SKIP")
    if env is not None:
        return env not in ("", "0", "false")
    return bool(level_skip)


def matmul_fwd(features, boxes, strides, output_size: int = 7,
               sampling_ratio: int = 2, min_level: int = 2,
               chunk: int = 128, level_skip: bool = False) -> jnp.ndarray:
    """Gather-free multilevel ROIAlignV2 via dense per-level contractions.

    features: list of (B, H_l, W_l, C) NHWC maps. boxes: (B, R, 4) XYXY.
    Returns (B, R, P, P, C) in the feature dtype. Numerics match
    multilevel_roi_align exactly up to dtype rounding: the hat weights
    replicate the clamped bilinear sampling plan (clipped coords put weight
    1 on the edge row/col), and out-of-level RoIs are zero via the Wy mask
    (identical to pooling garbage and masking downstream — callers treat
    padded RoIs the same either way).

    level_skip (cfg.TPU.ROI_ALIGN_LEVEL_SKIP / env WEAKCUBE_RA_LEVEL_SKIP):
    sort RoIs by their assigned FPN level first and lax.cond-skip every
    (chunk, level) pair with no RoI at that level. The dense plan's cost is
    paid per level for ALL RoIs (masked-to-zero rows still burn einsum
    FLOPs and the (B, chunk, P, W, C) intermediate's HBM traffic); with
    level-sorted RoIs each chunk touches ~1-2 levels instead of all 5.
    Bit-exact: per-RoI arithmetic is unchanged (skipped work is exactly
    the all-zero-mask case) and the output is unsorted back.
    """
    import os
    B, R = boxes.shape[:2]
    P = output_size
    S = sampling_ratio
    L = len(features)
    C = features[0].shape[-1]
    levels = assign_fpn_levels(boxes, min_level, min_level + L - 1) - min_level
    skip = _level_skip_enabled(level_skip)
    if skip:
        perm = jnp.argsort(levels, axis=1, stable=True)          # (B, R)
        boxes = jnp.take_along_axis(boxes, perm[..., None], axis=1)
        levels = jnp.take_along_axis(levels, perm, axis=1)
    wdt = features[0].dtype
    grid = (jnp.arange(P * S, dtype=jnp.float32) + 0.5) / (P * S)

    chunk = int(os.environ.get("WEAKCUBE_RA_CHUNK", chunk))
    chunk = min(chunk, R)
    nc = -(-R // chunk)
    pad = nc * chunk - R

    if skip:
        lv_pad = jnp.pad(levels, ((0, 0), (0, pad)), constant_values=-1)
        lv_c = lv_pad.reshape(B, nc, chunk)
        active = [jnp.any(lv_c == l, axis=(0, 2)) for l in range(L)]  # (nc,)

    def hat(c, size):
        c = jnp.clip(c, 0.0, float(size - 1))
        w = jnp.maximum(
            0.0, 1.0 - jnp.abs(c[..., None]
                               - jnp.arange(size, dtype=jnp.float32)))
        return w.reshape(B, R, P, S, size).sum(3) / S

    # scan stacks per-chunk pooled outputs (ys); levels add into `out`
    # afterwards. (An earlier formulation threaded the accumulator through
    # the scan's xs/ys — structurally unlike the long-proven matmul_bwd
    # scan and implicated in a TPU worker crash; this one mirrors
    # matmul_bwd's plain scan shape.)
    out = None
    for l, f in enumerate(features):
        H, W = f.shape[1], f.shape[2]
        scale = 1.0 / strides[l]
        x1 = boxes[..., 0] * scale - 0.5
        y1 = boxes[..., 1] * scale - 0.5
        x2 = boxes[..., 2] * scale - 0.5
        y2 = boxes[..., 3] * scale - 0.5
        sx = x1[..., None] + jnp.maximum(x2 - x1, 1e-6)[..., None] * grid
        sy = y1[..., None] + jnp.maximum(y2 - y1, 1e-6)[..., None] * grid
        mask = (levels == l).astype(jnp.float32)
        wy = (hat(sy, H) * mask[..., None, None]).astype(wdt)
        wx = hat(sx, W).astype(wdt)
        wy = jnp.pad(wy, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wy = wy.reshape(B, nc, chunk, P, H).transpose(1, 0, 2, 3, 4)
        wx = wx.reshape(B, nc, chunk, P, W).transpose(1, 0, 2, 3, 4)
        # materialise the hat weights before the scan: inside the full train
        # graph XLA otherwise fuses the weight construction into the scan
        # body's einsums, and that fused kernel faults this chip's worker
        # (standalone pooler graphs compile the same math fine)
        wy, wx = jax.lax.optimization_barrier((wy, wx))

        def compute_chunk(wyk, wxk):
            v = jnp.einsum("bkpy,byxc->bkpxc", wyk, f)
            return jnp.einsum("bkqx,bkpxc->bkpqc", wxk, v)

        if skip:
            def body(carry, xs):
                wyk, wxk, act = xs
                o = jax.lax.cond(
                    act, compute_chunk,
                    lambda *_: jnp.zeros((B, chunk, P, P, C), wdt),
                    wyk, wxk)
                return carry, o
            xs = (wy, wx, active[l])
        else:
            def body(carry, xs):
                return carry, compute_chunk(*xs)
            xs = (wy, wx)

        _, ys = jax.lax.scan(body, 0, xs)  # (nc, B, chunk, P,P,C)
        out = ys if out is None else out + ys
    out = out.transpose(1, 0, 2, 3, 4, 5).reshape(B, nc * chunk, P, P, C)
    out = out[:, :R]
    if skip:
        inv = jnp.argsort(perm, axis=1)   # inverse permutation
        out = jax.vmap(lambda o, i: o[i])(out, inv)
    return out


# ---------------------------------------------------------------------------
# scatter-free matmul backward
# ---------------------------------------------------------------------------
# Bilinear ROIAlign is separable:
#   pooled[b,r,p,q,c] = sum_{y,x} Wy[b,r,p,y] * Wx[b,r,q,x] * feat[b,y,x,c]
# where Wy/Wx are closed-form hat-function interpolation matrices with the
# S x S average pooling folded in:
#   Wy[b,r,p,y] = (1/S) * sum_{i in bin p} max(0, 1 - |clip(sy[b,r,p*S+i]) - y|)
# (the clip to [0, size-1] reproduces the forward's edge clamping exactly:
# a sample clamped to the last row puts weight 1 there and 0 elsewhere).
# The feature gradient is therefore two dense contractions per FPN level:
#   u[b,r,p,x,c] = sum_q  Wx[b,r,q,x] * g[b,r,p,q,c]
#   df[b,y,x,c]  = sum_rp Wy[b,r,p,y] * u[b,r,p,x,c]
# Both ride the MXU. The dense form does ~size/3 redundant FLOPs per level
# (only <=S+1 of `size` hat entries are nonzero) but that is still far
# cheaper on TPU than lax.scatter_add, which serializes on duplicate
# indices — and the windowed-scatter plan additionally faults this chip's
# libtpu at compile. RoIs are masked per level through Wy; the RoI axis is
# chunked under lax.scan to bound the (B, chunk, P, W, C) intermediate.


def matmul_bwd(feat_shapes, feat_dtypes, boxes, g, strides,
               output_size: int, sampling_ratio: int, min_level: int,
               chunk: int = 128, level_skip: bool = False):
    """Gradient of multilevel ROIAlign w.r.t. the feature pyramid via dense
    per-level contractions (no scatter). Args as `windowed_scatter_bwd`;
    level_skip as in matmul_fwd (the same stable argsort of the level
    assignment reproduces the forward's permutation exactly, and the
    feature-space gradient needs no unsort — skipped chunks contribute the
    exact zero their all-masked Wy rows would)."""
    import os
    B, R = boxes.shape[:2]
    P = output_size
    S = sampling_ratio
    L = len(feat_shapes)
    levels = assign_fpn_levels(boxes, min_level, min_level + L - 1) - min_level
    skip = _level_skip_enabled(level_skip)
    if skip:
        perm = jnp.argsort(levels, axis=1, stable=True)
        boxes = jnp.take_along_axis(boxes, perm[..., None], axis=1)
        levels = jnp.take_along_axis(levels, perm, axis=1)
        g = jax.vmap(lambda gi, i: gi[i])(g, perm)
    wdt = g.dtype  # bf16 on the TPU compute path keeps the matmuls on-MXU
    grid = (jnp.arange(P * S, dtype=jnp.float32) + 0.5) / (P * S)

    chunk = int(os.environ.get("WEAKCUBE_RA_CHUNK", chunk))
    chunk = min(chunk, R)
    nc = -(-R // chunk)
    pad = nc * chunk - R
    g_c = jnp.pad(g, ((0, 0), (0, pad)) + ((0, 0),) * (g.ndim - 2))
    # (nc, B, chunk, P, P, C) scan layout
    g_c = g_c.reshape(B, nc, chunk, P, P, -1).transpose(1, 0, 2, 3, 4, 5)

    if skip:
        lv_pad = jnp.pad(levels, ((0, 0), (0, pad)), constant_values=-1)
        lv_c = lv_pad.reshape(B, nc, chunk)
        active = [jnp.any(lv_c == l, axis=(0, 2)) for l in range(L)]

    def hat(c, size):
        """(B, R, P*S) sample coords -> (B, R, P, size) pooled hat weights."""
        c = jnp.clip(c, 0.0, float(size - 1))
        w = jnp.maximum(
            0.0, 1.0 - jnp.abs(c[..., None]
                               - jnp.arange(size, dtype=jnp.float32)))
        return w.reshape(B, R, P, S, size).sum(3) / S

    grads = []
    for l, (shape, dt) in enumerate(zip(feat_shapes, feat_dtypes)):
        H, W, C = shape[1], shape[2], shape[3]
        scale = 1.0 / strides[l]
        x1 = boxes[..., 0] * scale - 0.5
        y1 = boxes[..., 1] * scale - 0.5
        x2 = boxes[..., 2] * scale - 0.5
        y2 = boxes[..., 3] * scale - 0.5
        sx = x1[..., None] + jnp.maximum(x2 - x1, 1e-6)[..., None] * grid
        sy = y1[..., None] + jnp.maximum(y2 - y1, 1e-6)[..., None] * grid
        mask = (levels == l).astype(jnp.float32)            # (B, R)
        wy = (hat(sy, H) * mask[..., None, None]).astype(wdt)
        wx = hat(sx, W).astype(wdt)                          # (B, R, P, W)
        wy = jnp.pad(wy, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wy = wy.reshape(B, nc, chunk, P, H).transpose(1, 0, 2, 3, 4)
        wx = wx.reshape(B, nc, chunk, P, W).transpose(1, 0, 2, 3, 4)

        def contrib(wyk, wxk, gk):
            u = jnp.einsum("brqx,brpqc->brpxc", wxk, gk)
            return jnp.einsum("brpy,brpxc->byxc", wyk, u,
                              preferred_element_type=jnp.float32)

        if skip:
            # the accumulator rides through the cond so a skipped chunk
            # does not even pay the (B, H, W, C) add
            def body(acc, xs):
                wyk, wxk, gk, act = xs
                acc = jax.lax.cond(
                    act,
                    lambda a, wyk_, wxk_, gk_: a + contrib(wyk_, wxk_, gk_),
                    lambda a, *_: a,
                    acc, wyk, wxk, gk)
                return acc, None
            xs = (wy, wx, g_c, active[l])
        else:
            def body(acc, xs):
                wyk, wxk, gk = xs
                return acc + contrib(wyk, wxk, gk), None
            xs = (wy, wx, g_c)

        acc0 = jnp.zeros((B, H, W, C), jnp.float32)
        df, _ = jax.lax.scan(body, acc0, xs)
        grads.append(df.astype(dt))
    return tuple(grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def multilevel_roi_align_trainable(features_tuple, boxes,
                                   strides=(4, 8, 16, 32, 64),
                                   output_size: int = 7,
                                   sampling_ratio: int = 2,
                                   min_level: int = 2,
                                   bwd_plan: str = "matmul",
                                   fwd_plan: str = "gather",
                                   chunk: int = 128,
                                   level_skip: bool = False):
    """multilevel_roi_align with explicit forward/backward plans.

    bwd_plan: "matmul" (default — scatter-free dense contractions, MXU) or
    "windowed" (one (2,2,C)-block scatter_add per sample; ~4x fewer scatter
    rows than autodiff of the gather, but scatter serializes on TPU and the
    plan faults this chip's libtpu). fwd_plan: "gather" (take_along_axis —
    measured at ~3% HBM bandwidth at recipe scale, 191 ms for the b25x512
    box pooler), "matmul" (dense contractions, same plan as the
    backward), or "pallas" (the windowed-DMA inference kernel,
    ops/roi_align_pallas.py — bandwidth-proportional to the RoI window
    instead of FLOP-proportional to the full level; output cast back to
    the feature dtype; TPU-only). chunk bounds the matmul plans' RoI-axis
    scan intermediate.
    The boxes get NO gradient (proposals are stop-gradient'd
    upstream, matching the reference where proposals are created under
    no_grad). features_tuple must be a tuple (clean custom_vjp pytree).
    """
    if fwd_plan == "matmul":
        return matmul_fwd(list(features_tuple), boxes, strides,
                          output_size, sampling_ratio, min_level, chunk,
                          level_skip)
    if fwd_plan == "pallas":
        from .roi_align_pallas import multilevel_roi_align_pallas
        out = multilevel_roi_align_pallas(
            list(features_tuple), boxes, strides, output_size, min_level,
            sampling_ratio)
        return out.astype(features_tuple[0].dtype)
    return multilevel_roi_align(list(features_tuple), boxes, strides,
                                output_size, sampling_ratio, min_level)


def _mra_fwd(features_tuple, boxes, strides, output_size, sampling_ratio,
             min_level, bwd_plan, fwd_plan, chunk, level_skip):
    out = multilevel_roi_align_trainable(features_tuple, boxes, strides,
                                         output_size, sampling_ratio,
                                         min_level, bwd_plan, fwd_plan,
                                         chunk, level_skip)
    # the backward needs only each level's (B, H, W, C) shape and dtype —
    # carry zero-size views (f[:0]) instead of the arrays so the residuals
    # can never extend the features' liveness into the backward pass
    return out, (boxes, tuple(f[:0] for f in features_tuple))


def _mra_bwd(strides, output_size, sampling_ratio, min_level, bwd_plan,
             fwd_plan, chunk, level_skip, res, g):
    boxes, feat_meta = res
    B = boxes.shape[0]
    shapes = tuple((B,) + f.shape[1:] for f in feat_meta)
    dtypes = tuple(f.dtype for f in feat_meta)
    if bwd_plan == "matmul":
        grads = matmul_bwd(shapes, dtypes, boxes, g, strides, output_size,
                           sampling_ratio, min_level, chunk, level_skip)
    elif bwd_plan == "windowed":
        grads = windowed_scatter_bwd(shapes, dtypes, boxes, g, strides,
                                     output_size, sampling_ratio, min_level)
    else:
        # 'autodiff' means "don't enter this custom_vjp at all" — reaching
        # the backward with it is a caller bug, not a fallback opportunity
        raise ValueError(f"unknown bwd_plan {bwd_plan!r} inside "
                         "multilevel_roi_align_trainable")
    return grads, None


multilevel_roi_align_trainable.defvjp(_mra_fwd, _mra_bwd)
