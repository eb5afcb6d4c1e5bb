"""ResNet bottom-up backbone in flax.linen (NHWC, bf16-friendly).

Mirrors the capability of the reference's torchvision-based backbone
(cubercnn/modeling/backbone/resnet.py:12-63): resnet18/34/50/101 emitting
five levels {p2: stride 4, ..., p6: stride 64} where p6 is a stride-2
subsample of the deepest feature. Layer/kernel layout matches torchvision
exactly so released .pth weights can be converted into these params
(utils/torch_convert.py).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn

from ...ops import pool as pool_ops
import jax.numpy as jnp


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                         epsilon=1e-5, dtype=self.dtype, name=name)
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output = features * 4
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                         epsilon=1e-5, dtype=self.dtype, name=name)
        out_ch = self.features * 4
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


_SPECS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
}


class ResNetBottomUp(nn.Module):
    """torchvision-layout ResNet trunk -> {p2..p6} raw pyramid."""

    depth: int = 34
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        block, counts = _SPECS[self.depth]
        y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        outs = {}
        widths = (64, 128, 256, 512)
        for stage, (n_blocks, width) in enumerate(zip(counts, widths)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                y = block(width, stride if b == 0 else 1, dtype=self.dtype,
                          name=f"layer{stage + 1}_{b}")(y, train)
            outs[f"p{stage + 2}"] = y
        # stride-64 level: stride-2 subsample of the deepest map
        outs["p6"] = pool_ops.subsample2(outs["p5"])
        return outs

    @staticmethod
    def out_channels(depth: int) -> Dict[str, int]:
        mult = 1 if depth in (18, 34) else 4
        return {"p2": 64 * mult, "p3": 128 * mult, "p4": 256 * mult,
                "p5": 512 * mult, "p6": 512 * mult}
