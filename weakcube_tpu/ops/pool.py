"""TPU-friendly pooling variants.

`flax.linen.max_pool` lowers to `lax.reduce_window`, whose VJP is an XLA
SelectAndScatter op — scalar-serialized on TPU and a prime train-backward
sink (the DLA trunk pools at every Tree stage). For NON-OVERLAPPING
windows (kernel == stride, i.e. every pool in the DLA trunk, dla.py:113 +
the p6 (1,1)-window subsamples) the identical pooling is a reshape +
`reduce_max`, whose VJP XLA emits as a broadcast-compare-select mask —
pure elementwise VPU work.

Reference counterpart: torch nn.MaxPool2d(stride=k, kernel_size=k) inside
the DLA trunk (`/root/reference/cubercnn/modeling/backbone/dla.py`).
"""
from __future__ import annotations

import jax.numpy as jnp


def max_pool_nonoverlap(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Max pool with kernel == stride (VALID padding) on NHWC.

    Exactly `nn.max_pool(x, (stride, stride), (stride, stride))`: VALID
    windows drop the trailing H % stride rows/cols, reproduced here by
    cropping before the reshape.
    """
    if stride == 1:
        return x
    B, H, W, C = x.shape
    Hc, Wc = (H // stride) * stride, (W // stride) * stride
    x = x[:, :Hc, :Wc]
    x = x.reshape(B, Hc // stride, stride, Wc // stride, stride, C)
    return jnp.max(x, axis=(2, 4))


def subsample2(x: jnp.ndarray) -> jnp.ndarray:
    """`nn.max_pool(x, (1, 1), (2, 2))` — a (1,1) window maxes over one
    element, so the op is pure strided subsampling (ceil(H/2) rows): the
    p6 head of every FPN trunk here. The slice VJP is a pad — no scatter.
    """
    return x[:, ::2, ::2, :]
