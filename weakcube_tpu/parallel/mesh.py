"""Device mesh construction + sharding helpers.

TPU-native replacement for the reference's distributed layer (detectron2
`launch` + torch DDP + NCCL, SURVEY §2.4/§2.5): single-controller JAX SPMD.
The batch is sharded over the 'data' mesh axis; parameters are replicated;
XLA inserts the gradient all-reduce over ICI automatically. Multi-slice
(DCN) scaling is the same code with a larger mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a Mesh; -1 in mesh_shape absorbs all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = list(mesh_shape or [-1])
    if -1 in shape:
        fixed = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // fixed
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array in the batch pytree with its batch axis sharded."""
    sh = batch_sharding(mesh, axis)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sh)
        return x

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
