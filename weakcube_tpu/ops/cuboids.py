"""Cuboid geometry: vertices, projection, allocentric pose, virtual depth.

TPU-native re-design of the reference geometry library
(cubercnn/util/math_util.py:142-909 and ProposalNetwork/utils/spaces.py,
conversions.py). Everything is fully vectorised over a leading batch axis —
the reference's per-instance Python loops (roi_heads.py:948-960,
spaces.py:get_all_corners) collapse into single einsums here so XLA can tile
them onto the MXU.

Conventions (identical to the reference):
  * box3d = [x, y, z, w, h, l]: (x,y,z) cuboid centre in camera space,
    (w,h,l) dimensions. Local axes: length l along x, height h along y,
    width w along z (math_util.py:142-245).
  * K is a 3x3 pinhole intrinsics matrix; camera looks down +z.
  * A "cube" tensor is the 15-vector [center(3), dims(3), R.flatten()(9)]
    (spaces.py Cubes).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import rotations

# Vertex numbering of math_util.py:176-193 (v0..v7) via the sign pattern of
# the local (x=l, y=h, z=w) half-dimensions.
#           v4____________v5
#           /|            /|
#          / |           / |
#       v0/__|________v1/  |
#         |  |__________|__|
#         | / v7        |  /v6
#         |/____________| /
#        v3             v2
_CORNER_SIGNS = jnp.array(
    [
        # x (l)   y (h)   z (w)
        [-1, -1, -1],  # v0
        [+1, -1, -1],  # v1
        [+1, +1, -1],  # v2
        [-1, +1, -1],  # v3
        [-1, -1, +1],  # v4
        [+1, -1, +1],  # v5
        [+1, +1, +1],  # v6
        [-1, +1, +1],  # v7
    ],
    dtype=jnp.float32,
)

# 12 triangles, 2 per face (math_util.py:224-240); outward-oriented.
CUBE_FACES = jnp.array(
    [
        [0, 1, 2], [2, 3, 0],   # front  (z-)
        [1, 5, 6], [6, 2, 1],   # right  (x+)
        [4, 0, 3], [3, 7, 4],   # left   (x-)
        [5, 4, 7], [7, 6, 5],   # back   (z+)
        [4, 5, 1], [1, 0, 4],   # top    (y-)
        [3, 2, 6], [6, 7, 3],   # bottom (y+)
    ],
    dtype=jnp.int32,
)

# The 6 planes of the unit cube as (point_idx_a, point_idx_b, point_idx_c,
# point_idx_d) quads, outward order — used by iou3d.
CUBE_QUADS = jnp.array(
    [
        [0, 1, 2, 3],  # front
        [1, 5, 6, 2],  # right
        [4, 0, 3, 7],  # left
        [5, 4, 7, 6],  # back
        [4, 5, 1, 0],  # top
        [3, 2, 6, 7],  # bottom
    ],
    dtype=jnp.int32,
)


def get_cuboid_verts_3d(box3d: jnp.ndarray, R: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[..., 6] (x,y,z,w,h,l) + optional [..., 3, 3] R -> corners [..., 8, 3].

    Vectorised equivalent of math_util.py:142-245 `get_cuboid_verts_faces`.
    """
    ctr = box3d[..., 0:3]
    whl = box3d[..., 3:6]
    # local half extents in (x=l, y=h, z=w) order
    half = 0.5 * jnp.stack([box3d[..., 5], box3d[..., 4], box3d[..., 3]], axis=-1)
    local = _CORNER_SIGNS * half[..., None, :]  # (..., 8, 3)
    if R is not None:
        local = jnp.einsum("...ij,...kj->...ki", R, local)
    return local + ctr[..., None, :]


def get_cuboid_verts_3d_np(box3d, R=None) -> "np.ndarray":
    """Host-numpy twin of get_cuboid_verts_3d for eval/vis record building
    (avoids a device roundtrip per image on remote-TPU hosts)."""
    import numpy as np
    box3d = np.asarray(box3d, np.float32)
    ctr = box3d[..., 0:3]
    half = 0.5 * np.stack([box3d[..., 5], box3d[..., 4], box3d[..., 3]], -1)
    local = np.asarray(_CORNER_SIGNS) * half[..., None, :]
    if R is not None:
        local = np.einsum("...ij,...kj->...ki",
                          np.asarray(R, np.float32), local)
    return local + ctr[..., None, :]


def project_points(K: jnp.ndarray, pts3d: jnp.ndarray,
                   min_z: float = 1e-6) -> jnp.ndarray:
    """Project camera-space points [..., N, 3] with K [..., 3, 3].

    Returns [..., N, 3] = (u, v, z). Division guarded for z near 0 (sign
    preserved so behind-camera points project to the mirrored side, as the
    torch division does).
    """
    proj = jnp.einsum("...ij,...nj->...ni", K, pts3d)
    z = proj[..., 2:3]
    safe_z = jnp.where(jnp.abs(z) < min_z, jnp.where(z < 0, -min_z, min_z), z)
    return jnp.concatenate([proj[..., :2] / safe_z, z], axis=-1)


def get_cuboid_verts(K: jnp.ndarray, box3d: jnp.ndarray,
                     R: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project cuboid corners: returns (verts2d [..., 8, 3] = (u,v,z), verts3d)."""
    verts3d = get_cuboid_verts_3d(box3d, R)
    return project_points(K, verts3d), verts3d


def convert_3d_box_to_2d(K: jnp.ndarray, box3d: jnp.ndarray,
                         R: Optional[jnp.ndarray] = None,
                         clipw: float = 0.0, cliph: float = 0.0,
                         XYWH: bool = True, min_z: float = 0.20):
    """3D box -> enclosing 2D box via projection, with behind-camera clipping.

    Mirrors math_util.py:649-728: corners behind the camera plane (z<=min_z)
    are snapped to the image corner matching the sign quadrant of their 3D
    (x, y) before the min/max reduction.

    Returns (box2d [..., 4], behind_camera [...], fully_behind [...]).
    """
    verts2d, verts3d = get_cuboid_verts(K, box3d, R)
    behind = verts2d[..., 2] <= min_z  # (..., 8)
    behind_camera = jnp.any(behind, axis=-1)
    fully_behind = jnp.all(behind, axis=-1)

    sx = verts3d[..., 0] > 0
    sy = verts3d[..., 1] > 0
    bound_x = jnp.where(sx, clipw - 1.0, 0.0)
    bound_y = jnp.where(sy, cliph - 1.0, 0.0)
    u = jnp.where(behind, bound_x, verts2d[..., 0])
    v = jnp.where(behind, bound_y, verts2d[..., 1])

    x1 = jnp.min(u, axis=-1)
    y1 = jnp.min(v, axis=-1)
    x2 = jnp.max(u, axis=-1)
    y2 = jnp.max(v, axis=-1)
    if XYWH:
        box2d = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)
    else:
        box2d = jnp.stack([x1, y1, x2, y2], axis=-1)
    return box2d, behind_camera, fully_behind


def compute_virtual_scale_from_focal_spaces(f, H, f0, H0):
    """Depth scaling factor from real (f0, H0) to virtual (f, H) focal space
    (math_util.py:732-743)."""
    return (H0 * f) / (f0 * H)


def _allocentric_correction(K: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotation M aligning the optical axis with the viewing ray through
    pixel (u, v). Shared by both allocentric conversions
    (math_util.py:746-856)."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    sx, sy = K[..., 0, 2], K[..., 1, 2]
    oray = jnp.stack([(u - sx) / fx, (v - sy) / fy, jnp.ones_like(u)], axis=-1)
    oray = oray / jnp.maximum(jnp.linalg.norm(oray, axis=-1, keepdims=True), 1e-12)
    angle = jnp.arccos(jnp.clip(oray[..., 2], -1.0, 1.0))
    axis = jnp.stack([-oray[..., 1], oray[..., 0], jnp.zeros_like(u)], axis=-1)
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis_unit = axis / jnp.maximum(norm, 1e-12)
    # axis_angle_to_matrix returns identity as angle -> 0, matching the
    # reference's valid_angle gating.
    return rotations.axis_angle_to_matrix(angle[..., None] * axis_unit)


def R_to_allocentric(K: jnp.ndarray, R: jnp.ndarray,
                     u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Egocentric -> allocentric pose at pixel (u, v): R_view = M^T @ R."""
    M = _allocentric_correction(K, u, v)
    return jnp.swapaxes(M, -1, -2) @ R


def R_from_allocentric(K: jnp.ndarray, R_view: jnp.ndarray,
                       u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Allocentric -> egocentric pose at pixel (u, v): R = M @ R_view."""
    M = _allocentric_correction(K, u, v)
    return M @ R_view


def scaled_sigmoid(x: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """sigmoid(x) rescaled into [lo, hi] (math_util.py:1120-1129)."""
    return lo + jax.nn.sigmoid(x) * (hi - lo)


def backproject(uv: jnp.ndarray, z: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel (u, v) at depth z -> camera-space (x, y, z). uv: [..., 2]."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    sx, sy = K[..., 0, 2], K[..., 1, 2]
    x = z * (uv[..., 0] - sx) / fx
    y = z * (uv[..., 1] - sy) / fy
    return jnp.stack([x, y, z], axis=-1)


class Cubes(NamedTuple):
    """Dense batch of 3D cuboids — the JAX analogue of the reference `Cubes`
    (ProposalNetwork/utils/spaces.py), as a flat struct-of-arrays pytree.

    tensor: (..., 15) = [center(3), dims whl(3), R row-major (9)].
    Registered as a pytree via NamedTuple; safe under jit/vmap/scan.
    """

    tensor: jnp.ndarray

    @property
    def centers(self) -> jnp.ndarray:
        return self.tensor[..., 0:3]

    @property
    def dims(self) -> jnp.ndarray:
        return self.tensor[..., 3:6]

    @property
    def rotations(self) -> jnp.ndarray:
        return self.tensor[..., 6:15].reshape(self.tensor.shape[:-1] + (3, 3))

    @property
    def volumes(self) -> jnp.ndarray:
        return jnp.prod(self.dims, axis=-1)

    @classmethod
    def from_parts(cls, centers, dims, R) -> "Cubes":
        flat_R = R.reshape(R.shape[:-2] + (9,))
        return cls(jnp.concatenate([centers, dims, flat_R], axis=-1))

    def corners(self) -> jnp.ndarray:
        """All 8 corners in camera space, (..., 8, 3)."""
        return get_cuboid_verts_3d(self.tensor[..., :6], self.rotations)

    def bube_corners(self, K: jnp.ndarray,
                     im_wh: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Projected ("bube") corners (..., 8, 2), optionally clamped into
        the extended frame [-W/2+1, 2W-1] x [-H/2+1, 2H-1] as in
        spaces.py:224-245 (clamp-then-stack keeps gradients clean; in JAX
        clip has well-defined subgradients already)."""
        uvz = project_points(K, self.corners())
        uv = uvz[..., :2]
        if im_wh is not None:
            W, H = im_wh[..., 0], im_wh[..., 1]
            x = jnp.clip(uv[..., 0], (-W / 2 + 1)[..., None], (2 * W - 1)[..., None])
            y = jnp.clip(uv[..., 1], (-H / 2 + 1)[..., None], (2 * H - 1)[..., None])
            uv = jnp.stack([x, y], axis=-1)
        return uv

    def to_boxes(self, K: jnp.ndarray,
                 im_wh: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Enclosing 2D boxes (..., 4) XYXY of the projected corners
        (conversions.py:25-48 `cubes_to_box`)."""
        uv = self.bube_corners(K, im_wh)
        lo = jnp.min(uv, axis=-2)
        hi = jnp.max(uv, axis=-2)
        return jnp.concatenate([lo, hi], axis=-1)
