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

    # sample 3 valid indices per hypothesis. The reference samples WITHOUT
    # replacement (`random.sample(range(n), 3)`, Plane_torch.fit_parallel);
    # we accept with-replacement draws as an approximation: compact valid
    # indices to the front once (one argsort), then 3*H cheap uniform draws.
    # (A previous Gumbel-top-3 formulation materialised an (H, N) noise
    # matrix and top_k'ed every row — ~10 ms/image at 1000 x 10k, the
    # dominant cost of the pose_ground loss.) Duplicate indices make a
    # degenerate triple, which the count mask below discards — same as
    # collinear samples. `u % V` has a slight modulo bias when V ∤ n;
    # harmless for RANSAC (hypotheses need not be uniform, only plentiful).
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


def ground_normal_np(depth, K, mask=None, use_nth: int = 5,
                     thresh: float = 0.05, iters: int = 3):
    """Host-side (numpy) ground normal from a depth map — the cached
    counterpart of models.roi_heads.ground_normals_from_maps.

    Depth/ground pseudo-GT maps are STATIC per image, so re-running the
    1000-hypothesis RANSAC inside every train step (reference
    roi_heads.py:466-528) recomputes the same plane ~42k times per recipe
    run. This computes it ONCE per image in the data pipeline: backproject
    the masked points and fit a plane by SVD least-squares with `iters`
    rounds of inlier re-selection at the RANSAC threshold (deterministic
    robust fit instead of random hypotheses — same plane, no per-step
    noise), then apply the reference's wall-flip orientation fixes.

    Returns (normal (3,) float32, ok bool). `ok` is False when fewer than
    16 masked points exist.
    """
    import numpy as np

    depth = np.asarray(depth, np.float32)
    z = depth[::use_nth, ::use_nth]
    h, w = z.shape
    m = np.ones_like(z, bool) if mask is None else \
        np.asarray(mask)[::use_nth, ::use_nth] > 0
    m = m & (z > 1e-6)
    if m.sum() < 16:
        return np.array([0.0, 1.0, 0.0], np.float32), False
    K = np.asarray(K, np.float32)
    u, v = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32))
    fx = max(K[0, 0] / use_nth, 1e-6)
    fy = max(K[1, 1] / use_nth, 1e-6)
    x = (u - w / 2.0) * z / fx
    y = (v - h / 2.0) * z / fy
    pts = np.stack([x[m], y[m], z[m]], -1)
    if len(pts) > 10000:   # SVD cost cap; stride keeps spatial coverage
        pts = pts[:: len(pts) // 10000 + 1]

    sel = np.ones(len(pts), bool)
    n = np.array([0.0, 1.0, 0.0], np.float32)
    d0 = 0.0
    for _ in range(iters):
        p = pts[sel]
        if len(p) < 3:
            break
        c = p.mean(0)
        _, _, vt = np.linalg.svd(p - c, full_matrices=False)
        n = vt[-1]
        n = n / max(np.linalg.norm(n), 1e-12)
        d0 = -float(n @ c)
        dist = np.abs(pts @ n + d0)
        new_sel = dist <= thresh
        if new_sel.sum() < 16 or np.array_equal(new_sel, sel):
            break
        sel = new_sel

    # wall-flip orientation fixes, identical to the device path
    # (ground_normals_from_maps / roi_heads.py:507-520)
    ax, ay, az = np.abs(n)
    if az > ay:
        n = np.array([n[0], n[2], -n[1]], np.float32)
    ax, ay = np.abs(n[0]), np.abs(n[1])
    if ax > ay:
        n = np.array([-n[2], n[0], n[1]], np.float32)
    if n[1] < 0:
        n = -n
    return n.astype(np.float32), True
