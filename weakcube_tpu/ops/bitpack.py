"""Bit-packed boolean mask transfer (host pack / in-graph unpack).

The weak-supervision train batch ships a (B, H, W) bool ground mask to the
device every step. A bool array is one BYTE per element on the wire, and on
tunnel-attached TPU hosts (~110 MB/s measured) the upload is the train
loop's bottleneck — the reference never sees this cost because its masks
live on local GPU memory (cubercnn/data/dataset_mapper.py:124-147 keeps
them as torch bool tensors). Packing 8 pixels/byte cuts the mask payload 8x
for one cheap vectorised shift-and on device.

Bit order matches np.packbits(bitorder="big"): pixel x lands in bit
(7 - x % 8) of byte x // 8.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_mask_bits(mask: np.ndarray) -> np.ndarray:
    """(..., W) bool -> (..., ceil(W/8)) uint8 (host-side, numpy)."""
    return np.packbits(np.asarray(mask, bool), axis=-1)


def unpack_mask_bits(bits: jnp.ndarray, width: int) -> jnp.ndarray:
    """(..., Wb) uint8 -> (..., width) bool (device-side, jnp).

    width: the original unpadded W (np.packbits zero-pads to full bytes).
    """
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    b = (bits[..., None] >> shifts) & jnp.uint8(1)
    out = b.reshape(bits.shape[:-1] + (bits.shape[-1] * 8,))
    return out[..., :width].astype(bool)
