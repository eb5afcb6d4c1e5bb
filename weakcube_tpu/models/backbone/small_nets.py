"""Lightweight backbone sweep: ShuffleNetV2-x1.0, MNASNet-1.0, DenseNet-121.

Capability parity with the reference's torchvision-wrapped variants
(cubercnn/modeling/backbone/shufflenet.py, mnasnet.py, densenet.py — each
slices torchvision feature extractors into a 5-level pyramid for FPN).
Implemented natively in flax with torchvision-compatible layer structure.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn

from ...ops import pool as pool_ops
import jax.numpy as jnp


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


# ---------------------------------------------------------------------------
# ShuffleNet V2
# ---------------------------------------------------------------------------

def _channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H, W, groups, C // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(B, H, W, C)


class ShuffleUnit(nn.Module):
    out_ch: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        half = self.out_ch // 2
        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
        else:
            # downsampling branch transforms both paths
            x1 = nn.Conv(x.shape[-1], (3, 3), (2, 2), padding=1,
                         feature_group_count=x.shape[-1], use_bias=False,
                         dtype=self.dtype, name="branch1_dw")(x)
            x1 = _bn(train, self.dtype, "branch1_dw_bn")(x1)
            x1 = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype,
                         name="branch1_pw")(x1)
            x1 = nn.relu(_bn(train, self.dtype, "branch1_pw_bn")(x1))
            x2 = x
        y = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype, name="pw1")(x2)
        y = nn.relu(_bn(train, self.dtype, "pw1_bn")(y))
        y = nn.Conv(half, (3, 3), (self.stride, self.stride), padding=1,
                    feature_group_count=half, use_bias=False,
                    dtype=self.dtype, name="dw")(y)
        y = _bn(train, self.dtype, "dw_bn")(y)
        y = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype, name="pw2")(y)
        y = nn.relu(_bn(train, self.dtype, "pw2_bn")(y))
        out = jnp.concatenate([x1, y], axis=-1)
        return _channel_shuffle(out)


class ShuffleNetV2BottomUp(nn.Module):
    """x1.0 variant: stages (4, 8, 4) with channels (116, 232, 464) + 1024."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        y = nn.Conv(24, (3, 3), (2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_bn(train, self.dtype, "bn1")(y))
        p2 = nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        outs = {"p2": p2}
        y = p2
        for si, (reps, ch) in enumerate(zip((4, 8, 4), (116, 232, 464))):
            y = ShuffleUnit(ch, 2, self.dtype, name=f"stage{si + 2}_0")(y, train)
            for r in range(1, reps):
                y = ShuffleUnit(ch, 1, self.dtype, name=f"stage{si + 2}_{r}")(y, train)
            outs[f"p{si + 3}"] = y
        y = nn.Conv(1024, (1, 1), use_bias=False, dtype=self.dtype, name="conv5")(y)
        y = nn.relu(_bn(train, self.dtype, "conv5_bn")(y))
        outs["p5"] = y
        outs["p6"] = pool_ops.subsample2(y)
        return outs

    @staticmethod
    def out_channels() -> Dict[str, int]:
        return {"p2": 24, "p3": 116, "p4": 232, "p5": 1024, "p6": 1024}


# ---------------------------------------------------------------------------
# MNASNet 1.0
# ---------------------------------------------------------------------------

class InvertedResidual(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    expand: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        mid = x.shape[-1] * self.expand
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(x)
        y = nn.relu(_bn(train, self.dtype, "expand_bn")(y))
        k = self.kernel
        y = nn.Conv(mid, (k, k), (self.stride, self.stride), padding=k // 2,
                    feature_group_count=mid, use_bias=False, dtype=self.dtype,
                    name="dw")(y)
        y = nn.relu(_bn(train, self.dtype, "dw_bn")(y))
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(y)
        y = _bn(train, self.dtype, "project_bn")(y)
        if self.stride == 1 and x.shape[-1] == self.out_ch:
            y = y + x
        return y


class MNASNetBottomUp(nn.Module):
    """MNASNet-1.0 feature trunk sliced into a 5-level pyramid
    (mnasnet.py layer slicing)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        d = self.dtype
        y = nn.Conv(32, (3, 3), (2, 2), padding=1, use_bias=False, dtype=d,
                    name="stem_conv")(x)
        y = nn.relu(_bn(train, d, "stem_bn")(y))
        y = nn.Conv(32, (3, 3), padding=1, feature_group_count=32,
                    use_bias=False, dtype=d, name="sep_dw")(y)
        y = nn.relu(_bn(train, d, "sep_dw_bn")(y))
        y = nn.Conv(16, (1, 1), use_bias=False, dtype=d, name="sep_pw")(y)
        y = _bn(train, d, "sep_pw_bn")(y)

        def stage(y, n, out_ch, k, s, e, name):
            y = InvertedResidual(out_ch, k, s, e, d, name=f"{name}_0")(y, train)
            for i in range(1, n):
                y = InvertedResidual(out_ch, k, 1, e, d, name=f"{name}_{i}")(y, train)
            return y

        y = stage(y, 3, 24, 3, 2, 3, "mb1")   # stride 4
        p2 = y
        y = stage(y, 3, 40, 5, 2, 3, "mb2")   # stride 8
        p3 = y
        y = stage(y, 3, 80, 5, 2, 6, "mb3")   # stride 16
        y = stage(y, 2, 96, 3, 1, 6, "mb4")
        p4 = y
        y = stage(y, 4, 192, 5, 2, 6, "mb5")  # stride 32
        y = stage(y, 1, 320, 3, 1, 6, "mb6")
        p5 = y
        return {"p2": p2, "p3": p3, "p4": p4, "p5": p5,
                "p6": pool_ops.subsample2(p5)}

    @staticmethod
    def out_channels() -> Dict[str, int]:
        return {"p2": 24, "p3": 40, "p4": 96, "p5": 320, "p6": 320}


# ---------------------------------------------------------------------------
# DenseNet 121
# ---------------------------------------------------------------------------

class DenseLayer(nn.Module):
    growth: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        y = nn.relu(_bn(train, self.dtype, "bn1")(x))
        y = nn.Conv(4 * self.growth, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(y)
        y = nn.relu(_bn(train, self.dtype, "bn2")(y))
        y = nn.Conv(self.growth, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetBottomUp(nn.Module):
    """DenseNet-121: blocks (6, 12, 24, 16), growth 32."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        d = self.dtype
        y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, dtype=d,
                    name="stem_conv")(x)
        y = nn.relu(_bn(train, d, "stem_bn")(y))
        y = nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        outs = {}
        blocks = (6, 12, 24, 16)
        for bi, n in enumerate(blocks):
            for li in range(n):
                y = DenseLayer(32, d, name=f"dense{bi + 1}_{li}")(y, train)
            outs[f"p{bi + 2}"] = y
            if bi < len(blocks) - 1:
                # transition: 1x1 halve channels + 2x2 avg pool
                t = nn.relu(_bn(train, d, f"trans{bi + 1}_bn")(y))
                t = nn.Conv(y.shape[-1] // 2, (1, 1), use_bias=False, dtype=d,
                            name=f"trans{bi + 1}_conv")(t)
                y = nn.avg_pool(t, (2, 2), (2, 2))
        outs["p6"] = pool_ops.subsample2(outs["p5"])
        return outs

    @staticmethod
    def out_channels() -> Dict[str, int]:
        return {"p2": 256, "p3": 512, "p4": 1024, "p5": 1024, "p6": 1024}
