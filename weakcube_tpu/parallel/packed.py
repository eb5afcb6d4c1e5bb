"""Packed single-buffer batch upload for tunnel-attached hosts.

Round-5 measurement (tools/bench_tunnel_bw.py + the trainloop A/B): on the
axon tunnel a flat 1D uint8 device_put moves ~1.5 GB/s, but a multi-leaf
batch pytree uploaded leaf-by-leaf (jax.device_put per array) costs
~800 ms for a 33.6 MB recipe batch even against an idle device — the
per-array host-side layout/dispatch path, not the bytes, dominates. The
reference never sees this (its DataLoader feeds a PCIe GPU,
/root/reference/tools/train_net.py:186-200).

So: concatenate every leaf's bytes into ONE host uint8 buffer, upload
once, and slice + bitcast + reshape back inside a tiny jitted program.
The unpack program's cost is one ~2x pass over the batch bytes at HBM
rate (<1 ms) plus a dispatch.

Use `pack_spec(batch)` once per (shape, dtype) signature, then
`pack(batch)` per step on the host and `unpack_fn(buf)` (jitted) on
device. Bitcasts are little-endian on both sides.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ALIGN = 128  # keep every leaf's byte offset lane-aligned


class PackSpec:
    """Byte layout of a flattened batch pytree: (offset, nbytes, dtype,
    shape) per leaf + the treedef to rebuild the pytree."""

    def __init__(self, leaves: List[np.ndarray], treedef):
        self.treedef = treedef
        self.entries: List[Tuple[int, int, Any, Tuple[int, ...]]] = []
        off = 0
        for a in leaves:
            n = a.nbytes
            self.entries.append((off, n, a.dtype, a.shape))
            off += -(-n // ALIGN) * ALIGN
        self.total = off


def pack_spec(batch) -> PackSpec:
    leaves, treedef = jax.tree_util.tree_flatten(batch)
    return PackSpec([np.asarray(x) for x in leaves], treedef)


def pack(batch, spec: PackSpec) -> np.ndarray:
    """Host side: one contiguous uint8 buffer with every leaf's bytes."""
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(batch)]
    buf = np.zeros(spec.total, np.uint8)
    for a, (off, n, dt, shape) in zip(leaves, spec.entries):
        assert a.dtype == dt and a.shape == shape, (a.dtype, dt, a.shape)
        buf[off:off + n] = np.ascontiguousarray(a).view(np.uint8).ravel()
    return buf


def make_unpack(spec: PackSpec):
    """Jitted device-side inverse of `pack`."""

    def unpack(buf: jnp.ndarray):
        leaves = []
        for off, n, dt, shape in spec.entries:
            raw = jax.lax.dynamic_slice(buf, (off,), (n,))
            dt = np.dtype(dt)
            if dt == np.uint8:
                a = raw
            elif dt == np.bool_:
                a = raw.astype(jnp.bool_)
            else:
                w = dt.itemsize
                a = jax.lax.bitcast_convert_type(
                    raw.reshape(n // w, w), jnp.dtype(dt))
            leaves.append(a.reshape(shape))
        return jax.tree_util.tree_unflatten(spec.treedef, leaves)

    return jax.jit(unpack)
