"""Exact 3D cuboid intersection-over-union — pure JAX, static shapes.

Replaces `pytorch3d._C.iou_box3d` (used by the reference for eval,
cubercnn/evaluation/omni3d_evaluation.py:37,155,1410-1413, and train-time
logging, roi_heads.py:936-945).

Algorithm (same mathematical structure as pytorch3d's box3d_overlap, built
here as fixed-size vectorised ops instead of CUDA):
  1. Each box contributes 12 outward-consistent boundary triangles
     (cuboids.CUBE_FACES) and 6 clipping half-planes.
  2. Clip every triangle of A against the 6 half-planes of B
     (Sutherland–Hodgman on a convex polygon: stays ONE convex polygon,
     vertex count <= 3 + 6 = 9 -> padded buffers of 10) and vice versa.
  3. The surviving polygons bound the intersection volume; its volume is
     the divergence-theorem sum (1/6) * sum over fan triangles of
     det(a, b, c), consistent because clipping preserves winding.

Everything is branch-free: polygons are (10, 3) buffers + a live count, and
the clip's "emit vertex / emit intersection" compaction is an argsort over
emission flags. vmap over (pairs, triangles); lax.fori over the 6 planes.

Corner ordering must match cuboids.get_cuboid_verts_3d (the reference's
vertex diagram, math_util.py:176-193).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .cuboids import CUBE_FACES

_MAXV = 10          # 3 initial + 6 clips + 1 slack
_EPS = 1e-6


def box_planes(corners: jnp.ndarray):
    """6 outward half-planes of a cuboid given its (8, 3) corners.

    Returns (points (6, 3), normals (6, 3) unit outward).
    """
    quads = jnp.array(
        [[0, 1, 2, 3], [1, 5, 6, 2], [4, 0, 3, 7],
         [5, 4, 7, 6], [4, 5, 1, 0], [3, 2, 6, 7]], dtype=jnp.int32)
    pts = corners[quads]                       # (6, 4, 3)
    centers = jnp.mean(pts, axis=1)            # (6, 3)
    n = jnp.cross(pts[:, 1] - pts[:, 0], pts[:, 2] - pts[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    box_center = jnp.mean(corners, axis=0)
    outward = jnp.sum(n * (centers - box_center), axis=-1, keepdims=True)
    n = n * jnp.sign(jnp.where(jnp.abs(outward) < 1e-12, 1.0, outward))
    return centers, n


def _clip_poly_halfplane(verts: jnp.ndarray, count: jnp.ndarray,
                         plane_pt: jnp.ndarray, plane_n: jnp.ndarray,
                         boundary_eps: float):
    """Clip a convex polygon to {x : (x - p) . n <= boundary_eps}.

    verts: (_MAXV, 3); count: int32 live vertices (order preserved).
    `boundary_eps` > 0 keeps points ON the plane (inclusive), < 0 cuts them
    (strict) — the coplanar-face disambiguation (see _pair_intersection_volume).
    """
    idx = jnp.arange(_MAXV)
    active = idx < count
    nxt_idx = jnp.where(idx + 1 < count, idx + 1, 0)
    cur = verts
    nxt = verts[nxt_idx]

    d_cur = jnp.sum((cur - plane_pt) * plane_n, axis=-1)
    d_nxt = jnp.sum((nxt - plane_pt) * plane_n, axis=-1)
    in_cur = d_cur <= boundary_eps
    in_nxt = d_nxt <= boundary_eps

    denom = d_cur - d_nxt
    t = d_cur / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = jnp.clip(t, 0.0, 1.0)
    inter = cur + t[:, None] * (nxt - cur)

    emit_cur = active & in_cur                       # keep inside vertex
    emit_inter = active & (in_cur != in_nxt)         # crossing point

    # interleave (cur_0, inter_0, cur_1, inter_1, ...) to preserve order
    cand = jnp.stack([cur, inter], axis=1).reshape(2 * _MAXV, 3)
    flags = jnp.stack([emit_cur, emit_inter], axis=1).reshape(2 * _MAXV)

    big = 2 * _MAXV + 1
    keys = jnp.where(flags, jnp.arange(2 * _MAXV), big)
    order = jnp.argsort(keys)[:_MAXV]
    new_verts = cand[order]
    new_count = jnp.minimum(jnp.sum(flags), _MAXV).astype(jnp.int32)
    # zero out dead slots so downstream fans see repeated-last degenerates
    live = jnp.arange(_MAXV) < new_count
    new_verts = jnp.where(live[:, None], new_verts, new_verts[0])
    return new_verts, new_count


def _clipped_fan_volume(tri: jnp.ndarray, planes_pt: jnp.ndarray,
                        planes_n: jnp.ndarray,
                        boundary_eps: float) -> jnp.ndarray:
    """Clip one triangle (3, 3) against 6 half-planes; return its signed
    divergence-theorem volume contribution sum det(v0, vi, vi+1) / 6."""
    verts = jnp.concatenate([tri, jnp.tile(tri[0:1], (_MAXV - 3, 1))], axis=0)
    count = jnp.int32(3)

    def body(i, carry):
        v, c = carry
        return _clip_poly_halfplane(v, c, planes_pt[i], planes_n[i], boundary_eps)

    verts, count = jax.lax.fori_loop(0, planes_pt.shape[0], body, (verts, count))

    idx = jnp.arange(1, _MAXV - 1)
    valid = (idx + 1) < count
    a = verts[0]
    b = verts[idx]
    c = verts[idx + 1]
    det = jnp.sum(a * jnp.cross(b, c), axis=-1)
    return jnp.sum(jnp.where(valid, det, 0.0)) / 6.0


def _pair_intersection_volume(corners1: jnp.ndarray, corners2: jnp.ndarray) -> jnp.ndarray:
    """Intersection volume of two cuboids given (8, 3) corners each."""
    p2, n2 = box_planes(corners2)
    p1, n1 = box_planes(corners1)
    tris1 = corners1[CUBE_FACES]               # (12, 3, 3)
    tris2 = corners2[CUBE_FACES]
    # Coplanar-face disambiguation: faces of A that lie exactly on a plane
    # of B are kept in A's pass (inclusive eps) but cut in B's pass (strict
    # -eps), so a shared boundary is counted exactly once. This is how
    # identical/touching boxes come out right without the reference's
    # pre-nudging of coplanar boxes (omni3d_evaluation.py:151-164).
    vol_fn = jax.vmap(_clipped_fan_volume, in_axes=(0, None, None, None))
    v_a = jnp.sum(vol_fn(tris1, p2, n2, _EPS))
    v_b = jnp.sum(vol_fn(tris2, p1, n1, -_EPS))
    return jnp.abs(v_a + v_b)


def box_volume(corners: jnp.ndarray) -> jnp.ndarray:
    """Volume of a cuboid from its (..., 8, 3) corners (|det| of edge frame)."""
    e1 = corners[..., 1, :] - corners[..., 0, :]
    e2 = corners[..., 3, :] - corners[..., 0, :]
    e3 = corners[..., 4, :] - corners[..., 0, :]
    return jnp.abs(jnp.sum(e1 * jnp.cross(e2, e3), axis=-1))


@partial(jax.jit, static_argnames=())
def pairwise_iou3d(corners1: jnp.ndarray, corners2: jnp.ndarray):
    """Exact IoU3D between all pairs: (N, 8, 3) x (M, 8, 3) -> (vol, iou)
    both (N, M). Degenerate (near-zero-volume) boxes give IoU 0."""
    inter = jax.vmap(lambda ca: jax.vmap(lambda cb: _pair_intersection_volume(ca, cb))(corners2))(corners1)
    v1 = box_volume(corners1)
    v2 = box_volume(corners2)
    union = v1[:, None] + v2[None, :] - inter
    good = (v1[:, None] > 1e-8) & (v2[None, :] > 1e-8)
    iou = jnp.where(good & (union > 1e-12), inter / jnp.maximum(union, 1e-12), 0.0)
    return inter, jnp.clip(iou, 0.0, 1.0)


def matched_iou3d(corners1: jnp.ndarray, corners2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU3D for aligned (N, 8, 3) arrays (train-time logging,
    roi_heads.py:936-945 takes the diagonal)."""
    inter = jax.vmap(_pair_intersection_volume)(corners1, corners2)
    v1 = box_volume(corners1)
    v2 = box_volume(corners2)
    union = v1 + v2 - inter
    good = (v1 > 1e-8) & (v2 > 1e-8) & (union > 1e-12)
    return jnp.where(good, jnp.clip(inter / jnp.maximum(union, 1e-12), 0.0, 1.0), 0.0)
