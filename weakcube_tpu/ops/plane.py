"""Vectorised RANSAC plane fitting — pure JAX.

TPU-native equivalent of `Plane_torch.fit_parallel`
(ProposalNetwork/utils/plane.py:79-134): all `maxIteration` hypotheses are
evaluated in one batched pass (hypothesis sampling, plane equations from
point triples, inlier counting, argmax). Randomness flows through an
explicit PRNG key; point clouds are fixed-size with a validity mask so the
op sits inside the jitted train step (reference calls it per image inside
`normal_vector_from_maps`, roi_heads.py:466-528).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def ransac_plane(key: jax.Array, pts: jnp.ndarray,
                 valid: jnp.ndarray | None = None,
                 thresh: float = 0.05,
                 num_hypotheses: int = 1000) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit a plane to a (masked) point cloud by RANSAC.

    Args:
      key: PRNG key.
      pts: (N, 3) points (padded rows allowed).
      valid: (N,) bool; invalid points are never sampled and never counted
        as inliers. Default: all valid.
      thresh: inlier distance threshold (reference default 0.05 m).
      num_hypotheses: static hypothesis count (reference maxIteration=1000).
    Returns:
      (equation, inliers): plane as (4,) [A, B, C, D] with unit normal and
      the reference's sign flip (`return -self.equation`), and the (N,) bool
      inlier mask of the best hypothesis.
    """
    n = pts.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)

    # sample 3 valid indices per hypothesis WITH replacement (the
    # reference's np.random choice semantics): compact valid indices to the
    # front once (one argsort), then 3*H cheap uniform draws. (A previous
    # Gumbel-top-3 formulation materialised an (H, N) noise matrix and
    # top_k'ed every row — ~10 ms/image at 1000 x 10k, the dominant cost of
    # the pose_ground loss.) Duplicate indices make a degenerate triple,
    # which the count mask below discards — same as collinear samples.
    order = jnp.argsort(~valid, stable=True)             # valid-first
    V = jnp.maximum(jnp.sum(valid), 1)
    u = jax.random.randint(key, (num_hypotheses, 3), 0, n, jnp.int32)
    idx = order[u % V]                                   # (H, 3)
    tri = pts[idx]                                       # (H, 3, 3)

    vecA = tri[:, 1] - tri[:, 0]
    vecB = tri[:, 2] - tri[:, 0]
    normal = jnp.cross(vecA, vecB)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(norm, 1e-12)
    k = -jnp.sum(normal * tri[:, 1], axis=-1)            # (H,)
    # degenerate triples (collinear) get zero normals -> impossible planes
    degenerate = (norm[..., 0] < 1e-9)

    dist = jnp.abs(pts @ normal.T + k[None, :])          # (N, H)
    inl = (dist <= thresh) & valid[:, None]
    counts = jnp.where(degenerate, -1, jnp.sum(inl, axis=0))
    best = jnp.argmax(counts)
    eq = jnp.concatenate([normal[best], k[best][None]])
    return -eq, inl[:, best]


def up_vector_from_plane(equation: jnp.ndarray) -> jnp.ndarray:
    """Unit plane normal oriented to be an 'up' vector in camera space
    (y points down in camera coords, so flip normals with positive y).
    Mirrors the orientation fix-ups in roi_heads.py:466-528."""
    n = equation[..., :3]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return jnp.where(n[..., 1:2] > 0, -n, n)
