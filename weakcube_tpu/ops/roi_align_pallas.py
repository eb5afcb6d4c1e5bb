"""Pallas TPU kernel for multi-level ROIAlignV2 (inference hot path).

The XLA-gather formulation (ops/roi_align.py) moves 4 HBM reads per bilinear
sample through a giant gather. This kernel restructures the op TPU-natively:

  * grid = one program per RoI;
  * the RoI's (window x window x C) feature tile is DMA'd HBM -> VMEM once
    from its assigned pyramid level (5 predicated copies, one active);
  * bilinear interpolation becomes TWO SMALL MATMULS on the MXU:
        out[i, j, c] = sum_{y,x} Wy[i, y] * Wx[j, x] * tile[y, x, c]
    where Wy/Wx are (7, W) interpolation-weight matrices with the 2x2
    sample averaging folded in (each row: two bilinear rows averaged);
  * RoI scalars (window origin, level geometry, sub-pixel offsets) arrive
    via PrefetchScalarGridSpec so the DMA address is known before the body.

Fixed window: the FPN level heuristic bounds an RoI's extent at its level
to < 28 feature units for images <= ~720 px (scale in [224*2^(l-4),
224*2^(l-3)) per level), so a 32-unit window covers every sample with edge
clamping — identical semantics to ROIAlign's border clamp. Callers with
larger inputs use the XLA path.

Forward-only: training keeps the differentiable gather formulation
(scatter-add of overlapping RoI gradients across HBM is not worth a kernel
at these sizes); inference — the bench-critical path — uses this.
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


def _roi_align_kernel(meta_ref,      # scalar prefetch: (R, 4) int32
                      frac_ref,      # scalar prefetch: (R, 4) float32
                      *refs):
    """One program per RoI. refs = level_refs (L, HBM) + out_ref + scratch."""
    n_levels = len(refs) - 3
    out_ref = refs[n_levels]
    tile = refs[n_levels + 1]        # VMEM (WINDOW, WINDOW*C)
    sem = refs[n_levels + 2]
    r = pl.program_id(0)

    lvl = meta_ref[r, 0]
    y0 = meta_ref[r, 1]
    x0 = meta_ref[r, 2]

    # DMA the window from the RoI's level (predicated; exactly one fires)
    for li in range(n_levels):
        @pl.when(lvl == li)
        def _():
            src = refs[li]           # (H_l, W_l*C) in HBM
            C = out_ref.shape[-1]
            cp = pltpu.make_async_copy(
                src.at[pl.ds(y0, WINDOW), pl.ds(x0 * C, WINDOW * C)],
                tile, sem)
            cp.start()
            cp.wait()

    C = out_ref.shape[-1]
    P = out_ref.shape[0]             # 7

    # interpolation weights: sample grid start/step in window units
    sy0 = frac_ref[r, 0]
    sx0 = frac_ref[r, 1]
    sdy = frac_ref[r, 2]
    sdx = frac_ref[r, 3]

    def weights(start, step):
        # 2*P sample coords -> (P, WINDOW) averaged bilinear weight rows
        s = jax.lax.broadcasted_iota(jnp.float32, (2 * P, 1), 0)
        coord = start + s * step                       # (2P, 1)
        coord = jnp.clip(coord, 0.0, WINDOW - 1.0)
        grid = jax.lax.broadcasted_iota(jnp.float32, (2 * P, WINDOW), 1)
        d = 1.0 - jnp.abs(grid - coord)                # hat function
        w = jnp.maximum(d, 0.0)                        # (2P, WINDOW)
        return 0.5 * (w[0::2] + w[1::2])               # fold 2-sample average

    Wy = weights(sy0, sdy)                             # (P, WINDOW)
    Wx = weights(sx0, sdx)                             # (P, WINDOW)

    t = tile[...].reshape(WINDOW, WINDOW, C)
    a = jax.lax.dot_general(Wy, t.reshape(WINDOW, WINDOW * C),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = a.reshape(P, WINDOW, C)
    out = jax.lax.dot_general(Wx, a, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # dot_general output: (P_x, P_y, C) -> transpose to (P_y, P_x, C)
    out_ref[...] = jnp.swapaxes(out, 0, 1)


@functools.partial(jax.jit, static_argnames=("output_size", "strides", "min_level"))
def roi_align_pallas_single(features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                            strides=(4, 8, 16, 32, 64), output_size: int = 7,
                            min_level: int = 2) -> jnp.ndarray:
    """Single-image Pallas ROIAlign: features [(H_l, W_l, C)], boxes (R, 4)
    -> (R, 7, 7, C)."""
    R = boxes.shape[0]
    C = features[0].shape[-1]
    L = len(features)
    max_level = min_level + L - 1

    levels = assign_fpn_levels(boxes, min_level, max_level) - min_level
    inv_strides = jnp.asarray([1.0 / s for s in strides], jnp.float32)
    scale = inv_strides[levels]
    hs = jnp.asarray([f.shape[0] for f in features], jnp.int32)[levels]
    ws = jnp.asarray([f.shape[1] for f in features], jnp.int32)[levels]

    x1 = boxes[:, 0] * scale - 0.5
    y1 = boxes[:, 1] * scale - 0.5
    x2 = boxes[:, 2] * scale - 0.5
    y2 = boxes[:, 3] * scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1e-6)

    P2 = output_size * 2
    # first sample centre and step along each axis (level units)
    sy_start = y1 + roi_h / P2 * 0.5
    sx_start = x1 + roi_w / P2 * 0.5
    sdy = roi_h / P2
    sdx = roi_w / P2

    # window origin: clamp so the window stays in bounds
    y0 = jnp.clip(jnp.floor(sy_start).astype(jnp.int32),
                  0, jnp.maximum(hs - WINDOW, 0))
    x0 = jnp.clip(jnp.floor(sx_start).astype(jnp.int32),
                  0, jnp.maximum(ws - WINDOW, 0))

    meta = jnp.stack([levels, y0, x0, jnp.zeros_like(y0)], -1).astype(jnp.int32)
    frac = jnp.stack([sy_start - y0.astype(jnp.float32),
                      sx_start - x0.astype(jnp.float32), sdy, sdx], -1)

    # pad levels to >= WINDOW and flatten the channel into the row so the
    # window DMA is a contiguous 2D slice
    lv_inputs = []
    for f in features:
        H, W = f.shape[:2]
        ph = max(WINDOW - H, 0)
        pw = max(WINDOW - W, 0)
        if ph or pw:
            f = jnp.pad(f, ((0, ph), (0, pw), (0, 0)))
        lv_inputs.append(f.reshape(f.shape[0], f.shape[1] * C))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in lv_inputs],
        out_specs=pl.BlockSpec((1, output_size, output_size, C),
                               lambda r, *_: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((WINDOW, WINDOW * C), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )

    def kernel(meta_ref, frac_ref, *refs):
        # out block is (1, P, P, C); unwrap the leading dim
        n_levels = L
        out_ref = refs[n_levels]
        _roi_align_kernel(meta_ref, frac_ref,
                          *refs[:n_levels], out_ref.at[0],
                          *refs[n_levels + 1:])

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, output_size, output_size, C),
                                       jnp.float32),
    )(meta, frac, *lv_inputs)


def multilevel_roi_align_pallas(features: Sequence[jnp.ndarray],
                                boxes: jnp.ndarray,
                                strides=(4, 8, 16, 32, 64),
                                output_size: int = 7,
                                min_level: int = 2) -> jnp.ndarray:
    """Batched wrapper: features [(B, H, W, C)], boxes (B, R, 4)."""
    fn = functools.partial(roi_align_pallas_single, strides=tuple(strides),
                           output_size=output_size, min_level=min_level)
    return jax.vmap(lambda fs, b: fn(fs, b))(list(features), boxes)
