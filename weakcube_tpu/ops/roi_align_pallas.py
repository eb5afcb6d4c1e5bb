"""Pallas TPU kernel for multi-level ROIAlignV2 (inference hot path).

The XLA-gather formulation (ops/roi_align.py) moves 4 HBM reads per bilinear
sample through a giant gather. This kernel restructures the op TPU-natively:

  * the pyramid levels are stacked into ONE HBM buffer along rows (each
    level's width padded to the finest level's), so a RoI's window is a
    single unconditional 2D DMA at (row_offset[level] + y0, x0*C) — no
    per-level branching inside the kernel;
  * grid = one program per RoI; the (WINDOW x WINDOW x C) tile lands in
    VMEM once;
  * bilinear interpolation becomes TWO SMALL MATMULS on the MXU:
        out[i, j, c] = sum_{y,x} Wy[i, y] * Wx[j, x] * tile[y, x, c]
    with the 2x2 sample averaging folded into the (7, WINDOW) weight rows;
  * RoI scalars (window origin row/col, sub-pixel offsets) arrive via
    PrefetchScalarGridSpec so the DMA address is known up front.

Fixed window: the FPN level heuristic bounds an RoI's extent at its level
to < 28 feature units for images <= ~720 px, so a 32-unit window covers
every sample with edge clamping — the same border clamp ROIAlign performs.
Callers with larger inputs use the XLA path.

Window tiles are staged in bf16 (halves the dominant DMA cost; matmuls
accumulate fp32 on the MXU). Training uses `roi_align_pallas_trainable`
below: this kernel as the forward plus a linear scatter-add backward
(custom_vjp) — ROIAlign is linear in the features, so gradients depend only
on the bilinear sampling plan.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import assign_fpn_levels

WINDOW = 32
# DMA row starts must sit on the fp32 sublane tile (8 rows): the window row
# origin is snapped down to a multiple of 8 and the residual folded into the
# sub-pixel sample offset, so the row window carries 8 rows of slack.
WINDOW_Y = WINDOW + 8


def _roi_align_kernel(meta_ref, frac_ref, stacked_ref, out_ref, tile, sem,
                      sampling_ratio: int = 2):
    """One program per RoI. stacked_ref: (sumH_padded, maxW*C) in HBM."""
    r = pl.program_id(0)
    C = out_ref.shape[-1]
    P = out_ref.shape[0]
    row0 = pl.multiple_of(meta_ref[r, 0], 8)   # snapped window row
    col0 = meta_ref[r, 1]                       # x0 * C
    if C % 128 == 0:
        col0 = pl.multiple_of(col0, 128)

    cp = pltpu.make_async_copy(
        stacked_ref.at[pl.ds(row0, WINDOW_Y), pl.ds(col0, WINDOW * C)],
        tile, sem)
    cp.start()
    cp.wait()

    sy0 = frac_ref[r, 0]
    sx0 = frac_ref[r, 1]
    sdy = frac_ref[r, 2]
    sdx = frac_ref[r, 3]

    def weights(start, step, win):
        # (P, win) bilinear weight rows with the per-bin sample averaging
        # folded in (Mosaic-friendly: int iota + hat function, no slicing)
        bins = jax.lax.broadcasted_iota(jnp.int32, (P, win), 0).astype(jnp.float32)
        grid = jax.lax.broadcasted_iota(jnp.int32, (P, win), 1).astype(jnp.float32)
        S = sampling_ratio
        acc = 0.0
        for s in range(S):
            c = jnp.clip(start + (S * bins + s) * step, 0.0, win - 1.0)
            acc = acc + jnp.maximum(1.0 - jnp.abs(grid - c), 0.0)
        return acc / S

    Wy = weights(sy0, sdy, WINDOW_Y).astype(jnp.bfloat16)  # (P, WINDOW_Y)
    Wx = weights(sx0, sdx, WINDOW)                     # (P, WINDOW)

    # contract y: (P, WINDOW_Y) @ (WINDOW_Y, WINDOW*C) -> (P, WINDOW, C)
    a = jax.lax.dot_general(Wy, tile[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = a.reshape(P, WINDOW, C)
    # contract x: (Pj, W) x (Pi, W, C) -> (Pj, Pi, C), then one full-block
    # write (sliced sub-7 writes trip Mosaic's sublane tiling)
    b = jax.lax.dot_general(Wx, a, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out_ref[...] = jnp.swapaxes(b, 0, 1)


@functools.partial(jax.jit, static_argnames=("output_size", "strides",
                                             "min_level", "sampling_ratio"))
def roi_align_pallas_single(features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                            strides=(4, 8, 16, 32, 64), output_size: int = 7,
                            min_level: int = 2,
                            sampling_ratio: int = 2) -> jnp.ndarray:
    """Single-image Pallas ROIAlign: features [(H_l, W_l, C)], boxes (R, 4)
    -> (R, 7, 7, C)."""
    R = boxes.shape[0]
    C = features[0].shape[-1]
    L = len(features)
    max_level = min_level + L - 1
    maxW = max(max(f.shape[1] for f in features), WINDOW)

    # stack levels along rows; pad width to maxW and height to >= WINDOW_Y,
    # keeping every level height a multiple of 8 so the snapped row starts
    # stay tile-aligned in the stacked buffer
    rows = []
    row_offsets = []
    heights_padded = []
    off = 0
    for f in features:
        H, W = f.shape[:2]
        Hp = max(WINDOW_Y, -(-H // 8) * 8)
        f = jnp.pad(f, ((0, Hp - H), (0, maxW - W), (0, 0)))
        rows.append(f.reshape(Hp, maxW * C).astype(jnp.bfloat16))
        row_offsets.append(off)
        heights_padded.append(Hp)
        off += Hp
    stacked = jnp.concatenate(rows, axis=0)            # (sumH, maxW*C)
    row_offsets = jnp.asarray(row_offsets, jnp.int32)

    levels = assign_fpn_levels(boxes, min_level, max_level) - min_level
    inv_strides = jnp.asarray([1.0 / s for s in strides], jnp.float32)
    scale = inv_strides[levels]
    hs = jnp.asarray(heights_padded, jnp.int32)[levels]
    ws = jnp.asarray([f.shape[1] for f in features], jnp.int32)[levels]

    x1 = boxes[:, 0] * scale - 0.5
    y1 = boxes[:, 1] * scale - 0.5
    x2 = boxes[:, 2] * scale - 0.5
    y2 = boxes[:, 3] * scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1e-6)

    P2 = output_size * sampling_ratio
    sy_start = y1 + roi_h / P2 * 0.5
    sx_start = x1 + roi_w / P2 * 0.5
    sdy = roi_h / P2
    sdx = roi_w / P2

    # snap the row origin to the 8-row sublane tile (Mosaic DMA alignment);
    # the residual rides in the sub-pixel offset and the window has 8 rows
    # of slack (WINDOW_Y = WINDOW + 8)
    y0 = jnp.clip(jnp.floor(sy_start).astype(jnp.int32),
                  0, jnp.maximum(hs - WINDOW_Y, 0))
    y0 = (y0 // 8) * 8
    x0 = jnp.clip(jnp.floor(sx_start).astype(jnp.int32),
                  0, jnp.maximum(jnp.minimum(ws, maxW) - WINDOW, 0))

    meta = jnp.stack([row_offsets[levels] + y0, x0 * C,
                      jnp.zeros_like(y0), jnp.zeros_like(y0)], -1).astype(jnp.int32)
    frac = jnp.stack([sy_start - y0.astype(jnp.float32),
                      sx_start - x0.astype(jnp.float32), sdy, sdx], -1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, output_size, output_size, C),
                               lambda r, *_: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((WINDOW_Y, WINDOW * C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )

    def kernel(meta_ref, frac_ref, stacked_ref, out_ref, tile, sem):
        _roi_align_kernel(meta_ref, frac_ref, stacked_ref, out_ref.at[0],
                          tile, sem, sampling_ratio)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, output_size, output_size, C),
                                       jnp.float32),
    )(meta, frac, stacked)


def multilevel_roi_align_pallas(features: Sequence[jnp.ndarray],
                                boxes: jnp.ndarray,
                                strides=(4, 8, 16, 32, 64),
                                output_size: int = 7,
                                min_level: int = 2,
                                sampling_ratio: int = 2) -> jnp.ndarray:
    """Batched wrapper: features [(B, H, W, C)], boxes (B, R, 4)."""
    fn = functools.partial(roi_align_pallas_single, strides=tuple(strides),
                           output_size=output_size, min_level=min_level,
                           sampling_ratio=sampling_ratio)
    return jax.vmap(lambda fs, b: fn(fs, b))(list(features), boxes)


# ---------------------------------------------------------------------------
# trainable wrapper: Pallas forward + linear scatter backward
# ---------------------------------------------------------------------------
# ROIAlign is LINEAR in the features, so the backward pass needs only the
# bilinear index/weight plan, not the feature values: grad_features is a
# scatter-add of (upstream grad x bilinear weight) at the same sample
# positions the forward read. The forward runs the fast Pallas kernel; the
# backward reuses the XLA formulation's sampling plan.

def _sample_plan(boxes, feat_hw, strides, output_size, sampling_ratio, min_level):
    """Bilinear sampling plan for one image: flat indices + weights for the
    4 corners of every sample point. Mirrors ops.roi_align geometry."""
    from .roi_align import assign_fpn_levels
    R = boxes.shape[0]
    L = len(feat_hw)
    heights = jnp.asarray([h for h, w in feat_hw], jnp.int32)
    widths = jnp.asarray([w for h, w in feat_hw], jnp.int32)
    offsets = jnp.asarray(np.cumsum([0] + [h * w for h, w in feat_hw])[:-1],
                          jnp.int32)
    levels = assign_fpn_levels(boxes, min_level, min_level + L - 1) - min_level
    inv_strides = jnp.asarray([1.0 / s for s in strides], jnp.float32)
    scale = inv_strides[levels]
    lvl_h = heights[levels]
    lvl_w = widths[levels]
    lvl_off = offsets[levels]

    x1 = boxes[:, 0] * scale - 0.5
    y1 = boxes[:, 1] * scale - 0.5
    x2 = boxes[:, 2] * scale - 0.5
    y2 = boxes[:, 3] * scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1e-6)
    P = output_size * sampling_ratio
    grid = (jnp.arange(P, dtype=jnp.float32) + 0.5) / P
    sx = x1[:, None] + roi_w[:, None] * grid
    sy = y1[:, None] + roi_h[:, None] * grid

    def prep(coord, size):
        c = jnp.clip(coord, 0.0, size[:, None].astype(jnp.float32) - 1.0)
        lo = jnp.floor(c)
        frac = c - lo
        lo = lo.astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size[:, None] - 1)
        return lo, hi, frac

    x_lo, x_hi, fx = prep(sx, lvl_w)
    y_lo, y_hi, fy = prep(sy, lvl_h)

    def flat_idx(yy, xx):
        return (lvl_off[:, None, None] + yy[:, :, None] * lvl_w[:, None, None]
                + xx[:, None, :])

    idxs = [flat_idx(y_lo, x_lo), flat_idx(y_lo, x_hi),
            flat_idx(y_hi, x_lo), flat_idx(y_hi, x_hi)]
    ws = [(1 - fy)[:, :, None] * (1 - fx)[:, None, :],
          (1 - fy)[:, :, None] * fx[:, None, :],
          fy[:, :, None] * (1 - fx)[:, None, :],
          fy[:, :, None] * fx[:, None, :]]
    return idxs, ws, P


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def roi_align_pallas_trainable(features_tuple, boxes, strides=(4, 8, 16, 32, 64),
                               output_size: int = 7, sampling_ratio: int = 2,
                               min_level: int = 2):
    """Differentiable multi-level ROIAlign with the Pallas forward.

    features_tuple: tuple of (B, H_l, W_l, C) maps (tuple so it's a clean
    pytree for custom_vjp); boxes: (B, R, 4). Returns (B, R, P, P, C) fp32.
    """
    f32 = [f.astype(jnp.float32) for f in features_tuple]
    return multilevel_roi_align_pallas(f32, boxes, strides, output_size,
                                       min_level, sampling_ratio)


def _ra_fwd(features_tuple, boxes, strides, output_size, sampling_ratio,
            min_level):
    out = roi_align_pallas_trainable(features_tuple, boxes, strides,
                                     output_size, sampling_ratio, min_level)
    # residuals hold the feature arrays only for their shapes/dtypes (the op
    # is linear in features; in training they are alive anyway)
    return out, (boxes, features_tuple)


def _ra_bwd(strides, output_size, sampling_ratio, min_level, res, g):
    boxes, features_tuple = res
    shapes = tuple(f.shape for f in features_tuple)
    dtypes = tuple(f.dtype for f in features_tuple)
    B, R = boxes.shape[:2]
    C = shapes[0][-1]
    feat_hw = [(s[1], s[2]) for s in shapes]
    sizes = [h * w for h, w in feat_hw]
    total = sum(sizes)

    def per_image(boxes_i, g_i):
        idxs, ws, P = _sample_plan(boxes_i, feat_hw, strides, output_size,
                                   sampling_ratio, min_level)
        S = sampling_ratio
        # upstream grad at sample resolution: each of the S x S samples in a
        # bin receives g / S^2 (transpose of the average pool)
        gs = jnp.repeat(jnp.repeat(g_i, S, axis=1), S, axis=2) / (S * S)
        flat_grad = jnp.zeros((total, C), jnp.float32)
        for idx, w in zip(idxs, ws):
            vals = (gs * w[..., None]).reshape(R * P * P, C)
            flat_grad = flat_grad.at[idx.reshape(-1)].add(vals)
        return flat_grad

    flat_grads = jax.vmap(per_image)(boxes, g)          # (B, total, C)
    grads = []
    off = 0
    for (h, w), dt in zip(feat_hw, dtypes):
        grads.append(flat_grads[:, off:off + h * w].reshape(-1, h, w, C)
                     .astype(dt))
        off += h * w
    return tuple(grads), None


roi_align_pallas_trainable.defvjp(_ra_fwd, _ra_bwd)
