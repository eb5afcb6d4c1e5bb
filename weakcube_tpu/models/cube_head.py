"""3D cuboid prediction head (flax.linen).

Behavioral parity with the reference CubeHead
(cubercnn/modeling/roi_heads/cube_head.py:20-197): shared or per-branch
2x FC(1024) feature generator over flattened 7x7 RoI features, then
per-class linear outputs:
  - 2D centre deltas   (C, 2)
  - dimensions         (C, 3)   (log-space residuals vs priors)
  - pose               (C, 3, 3) from 6d / quaternion / euler params
  - depth z            (C, bins) (bias init 1, cube_head.py:138)
  - uncertainty        (C, 1)   clipped at 0.01, bias init 5 (:144)
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import rotations


class CubeHead(nn.Module):
    num_classes: int
    num_fc: int = 2
    fc_dim: int = 1024
    shared_fc: bool = True
    pose_type: str = "6d"          # '6d' | 'quaternion' | 'euler'
    cluster_bins: int = 1
    use_confidence: float = 1.0
    dtype: Any = jnp.float32

    def _feature_mlp(self, x, name):
        for i in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                                 name=f"{name}_fc{i + 1}")(x))
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (..., 7, 7, C) pooled features -> per-class 3D outputs."""
        x = x.reshape(x.shape[:-3] + (-1,))
        lead = x.shape[:-1]
        C = self.num_classes

        small = nn.initializers.normal(0.001)
        if self.shared_fc:
            f = self._feature_mlp(x, "shared")
            f_xy = f_dims = f_pose = f_z = f_conf = f
        else:
            f_xy = self._feature_mlp(x, "xy")
            f_dims = self._feature_mlp(x, "dims")
            f_pose = self._feature_mlp(x, "pose")
            f_z = self._feature_mlp(x, "z")
            f_conf = self._feature_mlp(x, "conf") if self.use_confidence else None

        deltas_2d = nn.Dense(C * 2, kernel_init=small, dtype=self.dtype,
                             name="bbox_3D_center_deltas")(f_xy).reshape(lead + (C, 2))
        dims = nn.Dense(C * 3, kernel_init=small, dtype=self.dtype,
                        name="bbox_3D_dims")(f_dims).reshape(lead + (C, 3))

        pose_dim = {"6d": 6, "quaternion": 4, "euler": 3}[self.pose_type]
        pose_raw = nn.Dense(C * pose_dim, kernel_init=small, dtype=self.dtype,
                            name="bbox_3D_pose")(f_pose).reshape(lead + (C, pose_dim))
        if self.pose_type == "6d":
            pose = rotations.rotation_6d_to_matrix(pose_raw)
        elif self.pose_type == "quaternion":
            # sign-normalise by w as in pytorch3d _copysign (cube_head.py:178-181)
            q = pose_raw
            q = q * jnp.sign(jnp.where(q[..., 0:1] == 0, 1.0, q[..., 0:1]))
            pose = rotations.quaternion_to_matrix(q)
        else:
            pose = rotations.euler_angles_to_matrix(pose_raw, "XYZ")

        bins = max(self.cluster_bins, 1)
        z = nn.Dense(C * bins, kernel_init=small,
                     bias_init=nn.initializers.constant(1.0), dtype=self.dtype,
                     name="bbox_3D_center_depth")(f_z)
        if self.cluster_bins > 1:
            z = z.reshape(lead + (self.cluster_bins, C))
        else:
            z = z.reshape(lead + (C,))

        uncert = None
        if self.use_confidence:
            uncert = nn.Dense(C, kernel_init=small,
                              bias_init=nn.initializers.constant(5.0),
                              dtype=self.dtype, name="bbox_3D_uncertainty")(f_conf)
            uncert = jnp.maximum(uncert, 0.01)

        return deltas_2d, z, dims, pose, uncert
