"""Feature Pyramid Network head over a bottom-up pyramid (flax.linen).

Functional equivalent of detectron2's FPN as the reference assembles it
(cubercnn/modeling/backbone/dla.py:484-506, resnet.py:66-96): 1x1 lateral
convs + nearest-neighbour top-down sum + 3x3 output convs, uniform
out_channels. The bottom-up's stride-64 'p6' input participates in the
top-down pathway exactly like any other level (the reference passes
in_features=[p2..p6]).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    in_features: Sequence[str] = ("p2", "p3", "p4", "p5", "p6")
    out_channels: int = 256
    fuse_type: str = "sum"  # 'sum' | 'avg'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bottom_up: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        names = list(self.in_features)
        feats = [bottom_up[n] for n in names]

        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{n}")(f)
            for n, f in zip(names, feats)
        ]

        # top-down: coarsest to finest
        merged = [None] * len(laterals)
        merged[-1] = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            up = _upsample_nearest_2x(merged[i + 1], laterals[i].shape)
            m = laterals[i] + up
            if self.fuse_type == "avg":
                m = m / 2.0
            merged[i] = m

        out = {}
        for n, m in zip(names, merged):
            out[n] = nn.Conv(self.out_channels, (3, 3), padding=1,
                             dtype=self.dtype, name=f"output_{n}")(m)
        return out


def _upsample_nearest_2x(x: jnp.ndarray, target_shape) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample to target (B, H, W, C) shape.

    Uses repeat (cheap reshape/broadcast in XLA) then crops to handle odd
    target sizes.
    """
    B, H, W, C = x.shape
    y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    th, tw = target_shape[1], target_shape[2]
    return y[:, :th, :tw, :]
