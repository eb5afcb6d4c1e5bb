"""Swin Transformer (tiny) backbone in flax — GroundingDINO's vision trunk.

Faithful Swin-T: patch embed 4x4, window attention (7x7) with relative
position bias, shifted windows on odd blocks, patch merging between stages;
depths (2, 2, 6, 2), dim 96, heads (3, 6, 12, 24). Emits the stride
8/16/32 stages (GroundingDINO consumes the last three).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x, w):
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, C)


def window_reverse(x, w, H, W):
    B = x.shape[0] // (H // w * W // w)
    x = x.reshape(B, H // w, W // w, w, w, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


class WindowMSA(nn.Module):
    dim: int
    heads: int
    window: int = 7
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (nW*B, w*w, C)
        Bn, N, C = x.shape
        dh = C // self.heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, self.heads, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * dh ** -0.5, k,
                          preferred_element_type=jnp.float32)

        # relative position bias
        w = self.window
        table = self.param("rel_bias_table", nn.initializers.normal(0.02),
                           ((2 * w - 1) ** 2, self.heads))
        coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                      indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.transpose(1, 2, 0) + (w - 1)
        idx = rel[..., 0] * (2 * w - 1) + rel[..., 1]
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(N, N, self.heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:  # (nW, N, N) shifted-window mask
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, self.heads, N, N) + \
                mask[None, :, None]
            attn = attn.reshape(Bn, self.heads, N, N)
        attn = jax.nn.softmax(attn, -1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


def _shift_mask(H, W, w, shift):
    img = np.zeros((1, H, W, 1))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws] = cnt
            cnt += 1
    win = window_partition(jnp.asarray(img), w)[..., 0]      # (nW, w*w)
    diff = win[:, :, None] - win[:, None, :]
    return jnp.where(diff != 0, -100.0, 0.0)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int = 7
    shift: int = 0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # Official detection-Swin order (mmdet/GroundingDINO trunk): pad the
        # map up to a window-7 multiple FIRST, then cyclic-shift, attend,
        # un-shift, crop. The window never shrinks, so the relative-bias
        # table shape is input-size independent (checkpoint compatible).
        B, H, W, C = x.shape
        w = self.window
        shift = self.shift
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        ph = (w - H % w) % w
        pw = (w - W % w) % w
        hp = jnp.pad(h, ((0, 0), (0, ph), (0, pw), (0, 0)))
        Hp, Wp = H + ph, W + pw
        if shift:
            hp = jnp.roll(hp, (-shift, -shift), axis=(1, 2))
        win = window_partition(hp, w)
        mask = _shift_mask(Hp, Wp, w, shift) if shift else None
        win = WindowMSA(self.dim, self.heads, w, self.dtype, name="attn")(win, mask)
        h = window_reverse(win, w, Hp, Wp)
        if shift:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        x = x + h[:, :H, :W]
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(4 * C, dtype=self.dtype, name="mlp_fc1")(h)
        # exact (erf) gelu matches the official timm Swin
        h = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(
            nn.gelu(h, approximate=False))
        return x + h


class SwinT(nn.Module):
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    heads: Tuple[int, ...] = (3, 6, 12, 24)
    out_stages: Tuple[int, ...] = (1, 2, 3)  # strides 8, 16, 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        y = nn.Conv(self.embed_dim, (4, 4), (4, 4), dtype=self.dtype,
                    name="patch_embed")(x)
        y = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(y)
        outs = []
        dim = self.embed_dim
        for si, (depth, nh) in enumerate(zip(self.depths, self.heads)):
            for bi in range(depth):
                y = SwinBlock(dim, nh, shift=0 if bi % 2 == 0 else 3,
                              dtype=self.dtype, name=f"stage{si}_block{bi}")(y)
            if si in self.out_stages:
                outs.append(nn.LayerNorm(dtype=self.dtype,
                                         name=f"out_norm{si}")(y))
            if si < len(self.depths) - 1:
                # patch merging: 2x2 concat + linear reduce (pad odd dims)
                B, H, W, C = y.shape
                y = jnp.pad(y, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
                B, H, W, C = y.shape
                y = y.reshape(B, H // 2, 2, W // 2, 2, C)
                y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
                y = nn.LayerNorm(dtype=self.dtype, name=f"merge_norm{si}")(y)
                y = nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                             name=f"merge_reduce{si}")(y)
                dim *= 2
        return outs
