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

Static window, auto-sized (32/64/128): the FPN level heuristic bounds a
typical RoI's extent at its level to ~14-20 feature units; only RoIs
clamped to the coarsest level can exceed it, bounded by that level's own
dims — _auto_window picks the smallest window covering them (32 up to
~720 px images with stride-32 pooling, 64 up to ~1440 px, e.g. KITTI).
Samples beyond the window edge-clamp — the same border clamp ROIAlign
performs.

Window tiles are staged in bf16 (halves the dominant DMA cost; matmuls
accumulate fp32 on the MXU). A double-buffered variant (window DMA for RoI
r+1 issued before waiting on r's) was measured SLOWER on the v5e (44.0 vs
41.7 ms inference pool, 283 vs 276 ms train step, 2026-08-22) — the
dynamic tiles[slot] addressing costs more than the inter-step DMA bubble
it hides — and was removed. Training uses this
kernel as the forward of ops/roi_align.py::multilevel_roi_align_trainable
(fwd_plan='pallas') with the scatter-free matmul backward — ROIAlign is
linear in the features, so gradients depend only on the bilinear sampling
plan. (A per-RoI read-modify-write Pallas backward and an XLA scatter-add
backward existed through round 4; both measured slower than the matmul
plan — 630 and 589 ms/step vs the shipped default at recipe scale — and
were removed.) (Reference: cube-rcnn ROIAlignV2 / detectron2 poolers; see
ops/roi_align.py for citations.)
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


def _auto_window(feat_hw) -> int:
    """Smallest window covering a whole-image RoI. The FPN level heuristic
    sends any non-degenerate-aspect RoI to a level where its extent is
    ~14-20 feature units; only top-level-clamped (huge) RoIs exceed that,
    bounded by the coarsest level's own dims. Extreme-aspect RoIs beyond the
    window degrade to edge-clamped samples (same border clamp as ROIAlign)."""
    need = max(feat_hw[-1])
    for w in (32, 64, 128):
        if need <= w:
            return w
    return 128


def _bilinear_weight_rows(start, step, win, P: int, sampling_ratio: int,
                          hi=None):
    """(P, win) bilinear weight rows with the per-bin sample averaging
    folded in (Mosaic-friendly: int iota + hat function, no slicing).

    hi: window-relative last REAL feature row/col for this RoI's level —
    samples clamp there (ROIAlign's border clamp) rather than running into
    the window's zero padding (levels narrower than the window, or boxes
    extending past the feature map)."""
    bins = jax.lax.broadcasted_iota(jnp.int32, (P, win), 0).astype(jnp.float32)
    grid = jax.lax.broadcasted_iota(jnp.int32, (P, win), 1).astype(jnp.float32)
    S = sampling_ratio
    top = win - 1.0 if hi is None else jnp.minimum(win - 1.0, hi)
    acc = 0.0
    for s in range(S):
        c = jnp.clip(start + (S * bins + s) * step, 0.0, top)
        acc = acc + jnp.maximum(1.0 - jnp.abs(grid - c), 0.0)
    return acc / S


def _roi_align_kernel(meta_ref, frac_ref, stacked_ref, out_ref, tile, sem,
                      sampling_ratio: int = 2):
    """One program per RoI. stacked_ref: (sumH_padded, maxW*C) in HBM.
    Window geometry comes from the tile scratch shape: (window+8, window*C)."""
    r = pl.program_id(0)
    C = out_ref.shape[-1]
    P = out_ref.shape[0]
    WY = tile.shape[0]
    W = WY - 8
    row0 = pl.multiple_of(meta_ref[r, 0], 8)   # snapped window row
    col0 = meta_ref[r, 1]                       # x0 * C
    if C % 128 == 0:
        col0 = pl.multiple_of(col0, 128)

    cp = pltpu.make_async_copy(
        stacked_ref.at[pl.ds(row0, WY), pl.ds(col0, W * C)],
        tile, sem)
    cp.start()
    cp.wait()

    sy0 = frac_ref[r, 0]
    sx0 = frac_ref[r, 1]
    sdy = frac_ref[r, 2]
    sdx = frac_ref[r, 3]
    ylim = meta_ref[r, 2].astype(jnp.float32)
    xlim = meta_ref[r, 3].astype(jnp.float32)

    Wy = _bilinear_weight_rows(sy0, sdy, WY, P,
                               sampling_ratio, ylim).astype(jnp.bfloat16)
    Wx = _bilinear_weight_rows(sx0, sdx, W, P, sampling_ratio, xlim)

    # contract y: (P, WY) @ (WY, W*C) -> (P, W, C)
    a = jax.lax.dot_general(Wy, tile[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = a.reshape(P, W, C)
    # contract x: (Pj, W) x (Pi, W, C) -> (Pj, Pi, C), then one full-block
    # write (sliced sub-7 writes trip Mosaic's sublane tiling)
    b = jax.lax.dot_general(Wx, a, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out_ref[...] = jnp.swapaxes(b, 0, 1).astype(out_ref.dtype)


def _stack_dims(feat_hw, window: int = WINDOW):
    """Stacked-buffer geometry shared by the forward and backward kernels:
    per-level padded heights (>= window+8, multiple of 8 so snapped row
    starts stay tile-aligned), their row offsets, padded width, total rows."""
    wy = window + 8
    heights_padded = [max(wy, -(-h // 8) * 8) for h, _ in feat_hw]
    row_offsets = list(np.cumsum([0] + heights_padded[:-1]))
    maxW = max(max(w for _, w in feat_hw), window)
    return heights_padded, row_offsets, maxW, sum(heights_padded)


def _window_meta(boxes, feat_hw, heights_padded, row_offsets, maxW, C,
                 strides, output_size, min_level, sampling_ratio,
                 window: int = WINDOW):
    """Per-RoI window plan for one image: meta (R, 4) int32 [stacked row
    origin, x0*C, 0, 0] and frac (R, 4) f32 [sy0, sx0, sdy, sdx]."""
    window_y = window + 8
    L = len(feat_hw)
    max_level = min_level + L - 1
    levels = assign_fpn_levels(boxes, min_level, max_level) - min_level
    inv_strides = jnp.asarray([1.0 / s for s in strides], jnp.float32)
    scale = inv_strides[levels]
    hs = jnp.asarray(heights_padded, jnp.int32)[levels]
    ws = jnp.asarray([w for _, w in feat_hw], jnp.int32)[levels]
    row_off = jnp.asarray(row_offsets, jnp.int32)[levels]

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
    # of slack (window_y = window + 8)
    y0 = jnp.clip(jnp.floor(sy_start).astype(jnp.int32),
                  0, jnp.maximum(hs - window_y, 0))
    y0 = (y0 // 8) * 8
    x0 = jnp.clip(jnp.floor(sx_start).astype(jnp.int32),
                  0, jnp.maximum(jnp.minimum(ws, maxW) - window, 0))

    # window-relative last REAL row/col of the RoI's level: samples clamp
    # there (ROIAlign border clamp), never into the window's zero padding
    real_h = jnp.asarray([h for h, _ in feat_hw], jnp.int32)[levels]
    meta = jnp.stack([row_off + y0, x0 * C,
                      real_h - 1 - y0, ws - 1 - x0], -1).astype(jnp.int32)
    frac = jnp.stack([sy_start - y0.astype(jnp.float32),
                      sx_start - x0.astype(jnp.float32), sdy, sdx], -1)
    return meta, frac


@functools.partial(jax.jit, static_argnames=("output_size", "strides",
                                             "min_level", "sampling_ratio",
                                             "window"))
def roi_align_pallas_single(features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                            strides=(4, 8, 16, 32, 64), output_size: int = 7,
                            min_level: int = 2,
                            sampling_ratio: int = 2,
                            window: int = 0) -> jnp.ndarray:
    """Single-image Pallas ROIAlign: features [(H_l, W_l, C)], boxes (R, 4)
    -> (R, 7, 7, C). window=0 selects the smallest size (32/64/128) that
    covers whole-image RoIs at the coarsest level."""
    R = boxes.shape[0]
    C = features[0].shape[-1]
    feat_hw = [f.shape[:2] for f in features]
    window = window or _auto_window(feat_hw)
    window_y = window + 8
    heights_padded, row_offsets, maxW, _ = _stack_dims(feat_hw, window)

    # stack levels along rows, padded to (Hp_l, maxW)
    rows = []
    for f, Hp in zip(features, heights_padded):
        H, W = f.shape[:2]
        f = jnp.pad(f, ((0, Hp - H), (0, maxW - W), (0, 0)))
        rows.append(f.reshape(Hp, maxW * C).astype(jnp.bfloat16))
    stacked = jnp.concatenate(rows, axis=0)            # (sumH, maxW*C)

    meta, frac = _window_meta(boxes, feat_hw, heights_padded, row_offsets,
                              maxW, C, strides, output_size, min_level,
                              sampling_ratio, window)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(R,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, output_size, output_size, C),
                               lambda r, *_: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((window_y, window * C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )

    def kernel(meta_ref, frac_ref, stacked_ref, out_ref, tile, sem):
        _roi_align_kernel(meta_ref, frac_ref, stacked_ref, out_ref.at[0],
                          tile, sem, sampling_ratio)

    # pooled output follows the FEATURE dtype: a bf16 pyramid (the
    # production inference path) writes a bf16 pooled tensor — at b32 x
    # 1000 RoIs x 7x7x256 the f32 form is a 1.6 GB HBM write that the box
    # head (bf16 matmuls) immediately down-casts anyway
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, output_size, output_size, C),
                                       features[0].dtype),
    )(meta, frac, stacked)


def multilevel_roi_align_pallas(features: Sequence[jnp.ndarray],
                                boxes: jnp.ndarray,
                                strides=(4, 8, 16, 32, 64),
                                output_size: int = 7,
                                min_level: int = 2,
                                sampling_ratio: int = 2,
                                window: int = 0) -> jnp.ndarray:
    """Batched wrapper: features [(B, H, W, C)], boxes (B, R, 4)."""
    fn = functools.partial(roi_align_pallas_single, strides=tuple(strides),
                           output_size=output_size, min_level=min_level,
                           sampling_ratio=sampling_ratio, window=window)
    return jax.vmap(lambda fs, b: fn(fs, b))(list(features), boxes)


