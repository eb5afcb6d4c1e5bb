"""Deep Layer Aggregation (DLA) backbone in flax.linen.

Capability parity with the reference's DLA implementation
(cubercnn/modeling/backbone/dla.py:40-415): hierarchical Tree/Root
aggregation, dla34/46_c/46x_c/60/60x/102/169 variants, emitting the raw
pyramid {p2: stride 4 ... p6: stride 64} consumed by the FPN
(dla.py:417-506 DLABackbone).

The recursion is static Python structure — XLA sees one flat graph. NHWC,
bf16-capable. Grouped/bottleneck-X variants use feature_group_count.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops import pool as pool_ops


def _bn(train: bool, dtype, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class DLABasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        d = self.dilation
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=d,
                    kernel_dilation=(d, d), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_bn(train, self.dtype, "bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding=d, kernel_dilation=(d, d),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _bn(train, self.dtype, "bn2")(y)
        return nn.relu(y + residual)


class DLABottleneck(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    expansion: int = 2
    cardinality: int = 1  # >1 -> bottleneck-X (grouped conv)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        mid = self.features // self.expansion
        if self.cardinality > 1:  # DLA-X: width scaled by cardinality/32
            mid = int(self.features * self.cardinality / 32) // self.expansion * self.expansion
        d = self.dilation
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_bn(train, self.dtype, "bn1")(y))
        y = nn.Conv(mid, (3, 3), (self.stride, self.stride), padding=d,
                    kernel_dilation=(d, d), use_bias=False,
                    feature_group_count=self.cardinality,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_bn(train, self.dtype, "bn2")(y))
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = _bn(train, self.dtype, "bn3")(y)
        return nn.relu(y + residual)


class Root(nn.Module):
    """Aggregation node: 1x1 conv over concatenated children (dla.py:156)."""
    features: int
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children: Sequence[jnp.ndarray], train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv")(x)
        y = _bn(train, self.dtype, "bn")(y)
        if self.residual:
            y = y + children[0]
        return nn.relu(y)


class Tree(nn.Module):
    """Recursive aggregation tree (dla.py:177-232)."""
    levels: int
    block: str  # 'basic' | 'bottleneck' | 'bottleneckx'
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_residual: bool = False
    dilation: int = 1
    dtype: Any = jnp.float32

    def _make_block(self, features, stride, name):
        if self.block == "basic":
            return DLABasicBlock(features, stride, self.dilation, self.dtype, name=name)
        if self.block == "bottleneck":
            return DLABottleneck(features, stride, self.dilation, dtype=self.dtype, name=name)
        return DLABottleneck(features, stride, self.dilation, cardinality=32,
                             dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, children=None, train: bool = False):
        children = list(children) if children else []
        # non-overlapping pool via reshape+max: nn.max_pool's VJP is an XLA
        # SelectAndScatter (serialized on TPU); this form's VJP is an
        # elementwise mask (ops/pool.py)
        bottom = pool_ops.max_pool_nonoverlap(x, self.stride)
        if self.in_channels != self.out_channels:
            proj = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                           dtype=self.dtype, name="project_conv")(bottom)
            proj = _bn(train, self.dtype, "project_bn")(proj)
        else:
            proj = bottom
        # dla.py:219: Tree.forward OVERWRITES any incoming residual with its
        # own project(bottom) — in a levels>1 tree the parent's project
        # output is dead compute (and its weights never receive gradient in
        # the reference either). The residual entering tree1's block chain
        # must therefore come from THIS tree's project, never the parent's:
        # in dla34's levels-2 trees the TRAINED weights of a released
        # checkpoint live under levelN.tree1.project, while levelN.project
        # sits at its initialization — using the parent's projection would
        # make converted checkpoints numerically wrong. (XLA dead-code
        # eliminates the unused parent projection; the parameters still
        # exist, matching the torch state dict.)
        residual = proj
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = self._make_block(self.out_channels, self.stride, "tree1")(x, residual, train)
            x2 = self._make_block(self.out_channels, 1, "tree2")(x1, None, train)
            out = Root(self.out_channels, self.root_residual, self.dtype,
                       name="root")([x2, x1] + children, train)
        else:
            x1 = Tree(self.levels - 1, self.block, self.in_channels, self.out_channels,
                      self.stride, root_residual=self.root_residual,
                      dilation=self.dilation, dtype=self.dtype, name="tree1")(
                          x, None, train)
            children.append(x1)
            out = Tree(self.levels - 1, self.block, self.out_channels, self.out_channels,
                       1, root_residual=self.root_residual, dilation=self.dilation,
                       dtype=self.dtype, name="tree2")(x1, children, train)
        return out


_DLA_SPECS: Dict[str, Tuple[Tuple[int, ...], Tuple[int, ...], str]] = {
    # levels, channels, block
    "dla34": ((1, 1, 1, 2, 2, 1), (16, 32, 64, 128, 256, 512), "basic"),
    "dla46_c": ((1, 1, 1, 2, 2, 1), (16, 32, 64, 64, 128, 256), "bottleneck"),
    "dla46x_c": ((1, 1, 1, 2, 2, 1), (16, 32, 64, 64, 128, 256), "bottleneckx"),
    "dla60x_c": ((1, 1, 1, 2, 3, 1), (16, 32, 64, 64, 128, 256), "bottleneckx"),
    "dla60": ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024), "bottleneck"),
    "dla60x": ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024), "bottleneckx"),
    "dla102": ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024), "bottleneck"),
    "dla102x": ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024), "bottleneckx"),
    "dla169": ((1, 2, 3, 5, 1, 1), (16, 32, 128, 256, 512, 1024), "bottleneck"),
}


class DLABottomUp(nn.Module):
    """DLA trunk -> raw {p2..p6} pyramid (strides 4..64)."""

    dla_type: str = "dla34"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        levels, channels, block = _DLA_SPECS[self.dla_type]
        y = nn.Conv(channels[0], (7, 7), padding=3, use_bias=False,
                    dtype=self.dtype, name="base_conv")(x)
        y = nn.relu(_bn(train, self.dtype, "base_bn")(y))

        def conv_level(y, ch, stride, name):
            y = nn.Conv(ch, (3, 3), (stride, stride), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"{name}_conv")(y)
            return nn.relu(_bn(train, self.dtype, f"{name}_bn")(y))

        l0 = conv_level(y, channels[0], 1, "level0")
        l1 = conv_level(l0, channels[1], 2, "level1")
        l2 = Tree(levels[2], block, channels[1], channels[2], 2, level_root=False,
                  dtype=self.dtype, name="level2")(l1, train=train)
        l3 = Tree(levels[3], block, channels[2], channels[3], 2, level_root=True,
                  dtype=self.dtype, name="level3")(l2, train=train)
        l4 = Tree(levels[4], block, channels[3], channels[4], 2, level_root=True,
                  dtype=self.dtype, name="level4")(l3, train=train)
        l5 = Tree(levels[5], block, channels[4], channels[5], 2, level_root=True,
                  dtype=self.dtype, name="level5")(l4, train=train)
        p6 = pool_ops.subsample2(l5)
        return {"p2": l2, "p3": l3, "p4": l4, "p5": l5, "p6": p6}

    @staticmethod
    def out_channels(dla_type: str) -> Dict[str, int]:
        ch = _DLA_SPECS[dla_type][1]
        return {"p2": ch[2], "p3": ch[3], "p4": ch[4], "p5": ch[5], "p6": ch[5]}
