"""Rotation representation conversions, pure JAX.

Covers the rotation math the reference pulls from pytorch3d.transforms
(reference: cubercnn/modeling/roi_heads/cube_head.py:10-15 and
cubercnn/util/math_util.py:1132-1236): 6d/quaternion/euler/axis-angle -> R,
SO(3) rotation angles, and the batched all-pairs relative angle used by the
intra-image pose-consistency loss.

All functions broadcast over leading batch dimensions and are jit/vmap/grad
safe (no data-dependent control flow; division guarded by epsilons).
Matrices act on column vectors: ``x_rotated = R @ x``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _normalize(v: jnp.ndarray, axis: int = -1, eps: float = _EPS) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Zhou et al. continuous 6D rotation representation -> (..., 3, 3).

    The 6 numbers are the first two rows of the matrix before Gram-Schmidt.
    Matches pytorch3d.transforms.rotation_6d_to_matrix (rows are b1,b2,b3).
    """
    a1, a2 = d6[..., 0:3], d6[..., 3:6]
    b1 = _normalize(a1)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = _normalize(b2)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-2)


def matrix_to_rotation_6d(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rotation_6d_to_matrix` (first two rows, flattened)."""
    return jnp.concatenate((R[..., 0, :], R[..., 1, :]), axis=-1)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix (..., 3, 3)."""
    q = _normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two = 2.0
    R = jnp.stack(
        [
            1 - two * (y * y + z * z), two * (x * y - z * w), two * (x * z + y * w),
            two * (x * y + z * w), 1 - two * (x * x + z * z), two * (y * z - x * w),
            two * (x * z - y * w), two * (y * z + x * w), 1 - two * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so w >= 0 (quaternion double cover)."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), branch-free.

    Uses the numerically-robust 4-way candidate construction: compute all
    four scaled candidate quaternions and select the one keyed to the
    largest diagonal combination (no data-dependent branching).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # squared magnitudes (x4) of each component, clipped at 0
    qw2 = jnp.maximum(0.0, 1 + m00 + m11 + m22)
    qx2 = jnp.maximum(0.0, 1 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1 - m00 - m11 + m22)

    # candidate quaternions, each stable when its key component dominates
    cand_w = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cand_x = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cand_y = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cand_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4, 4)
    keys = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    denom = 2.0 * jnp.sqrt(jnp.maximum(keys, _EPS))[..., None]
    cands = cands / denom
    best = jnp.argmax(keys, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    return standardize_quaternion(_normalize(q[..., 0, :]))


def _axis_rotation(angle: jnp.ndarray, axis: str) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        rows = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        rows = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        rows = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(f"bad axis {axis}")
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(angles: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """Euler angles (..., 3) -> R. Matches pytorch3d: R = R_c0 @ R_c1 @ R_c2."""
    if len(convention) != 3:
        raise ValueError("convention must have 3 letters")
    Rs = [_axis_rotation(angles[..., i], ax) for i, ax in enumerate(convention)]
    return Rs[0] @ Rs[1] @ Rs[2]


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle vector (angle = |v|) -> rotation matrix.

    Safe at angle -> 0 (returns identity with correct gradients via the
    sinc-style guarded formulation).
    """
    # "safe norm": clamp the squared norm before sqrt so no branch ever
    # produces NaN (d|v|/dv at v=0 is the classic where-grad trap).
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(sq, _EPS * _EPS))
    axis = axis_angle / angle  # exactly 0 at v=0 -> K=0 -> R=I
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    K = K.reshape(axis.shape[:-1] + (3, 3))
    a = angle[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), K.shape)
    return eye + jnp.sin(a) * K + (1.0 - jnp.cos(a)) * (K @ K)


def so3_rotation_angle(R: jnp.ndarray, cos_angle: bool = False,
                       eps: float = 1e-4) -> jnp.ndarray:
    """Rotation angle of R (trace formula), matching math_util.py:1184-1236."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0 + eps, 1.0 - eps)
    return cos if cos_angle else jnp.arccos(cos)


def so3_relative_angle(R1: jnp.ndarray, R2: jnp.ndarray,
                       cos_angle: bool = False) -> jnp.ndarray:
    """Angle of the relative rotation R1 @ R2^T."""
    R12 = R1 @ jnp.swapaxes(R2, -1, -2)
    return so3_rotation_angle(R12, cos_angle=cos_angle)


def so3_relative_angle_pairs(R: jnp.ndarray, mask: jnp.ndarray | None = None,
                             cos_angle: bool = True):
    """All-pairs relative angles within one set of rotations.

    TPU-native replacement for the reference's lower-triangle batched pairs
    (math_util.py:1132-1181 `so3_relative_angle_batched`): instead of
    materialising index lists we compute the full N x N Gram-like matrix with
    one einsum (MXU-friendly) and return a strict-lower-triangle validity
    mask; callers take masked means.

    Args:
      R: (N, 3, 3) rotations.
      mask: optional (N,) validity of each rotation.
      cos_angle: return cosines if True else angles in radians.
    Returns:
      (vals, pair_mask): both (N, N); pair_mask is True on valid strict
      lower-triangle pairs.
    """
    n = R.shape[0]
    # trace(R_i R_j^T) = sum_kl R_i[k,l] * R_j[k,l]
    traces = jnp.einsum("ikl,jkl->ij", R, R)
    cos = jnp.clip((traces - 1.0) * 0.5, -1.0 + 1e-4, 1.0 - 1e-4)
    vals = cos if cos_angle else jnp.arccos(cos)
    tri = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)
    if mask is not None:
        tri = tri & mask[:, None] & mask[None, :]
    return vals, tri
