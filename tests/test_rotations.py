import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as SR

from weakcube_tpu.ops import rotations as rot

RNG = np.random.default_rng(0)


def random_rotations(n):
    return SR.random(n, rng=np.random.default_rng(42)).as_matrix().astype(np.float32)


class TestQuaternion:
    def test_matches_scipy(self):
        q_xyzw = SR.random(32, rng=np.random.default_rng(1)).as_quat()
        q_wxyz = np.roll(q_xyzw, 1, axis=-1).astype(np.float32)
        R = rot.quaternion_to_matrix(jnp.asarray(q_wxyz))
        R_ref = SR.from_quat(q_xyzw).as_matrix()
        np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)

    def test_roundtrip(self):
        R = random_rotations(64)
        q = rot.matrix_to_quaternion(jnp.asarray(R))
        R2 = rot.quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_identity(self):
        q = jnp.array([1.0, 0, 0, 0])
        np.testing.assert_allclose(np.asarray(rot.quaternion_to_matrix(q)), np.eye(3), atol=1e-6)


class TestSixD:
    def test_orthonormal(self):
        d6 = jnp.asarray(RNG.normal(size=(50, 6)).astype(np.float32))
        R = rot.rotation_6d_to_matrix(d6)
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (50, 1, 1)), atol=1e-5)
        det = np.linalg.det(np.asarray(R))
        np.testing.assert_allclose(det, 1.0, atol=1e-5)

    def test_roundtrip(self):
        R = random_rotations(32)
        d6 = rot.matrix_to_rotation_6d(jnp.asarray(R))
        R2 = rot.rotation_6d_to_matrix(d6)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_gradient_finite(self):
        def f(d6):
            return jnp.sum(rot.rotation_6d_to_matrix(d6) ** 2)
        g = jax.grad(f)(jnp.zeros((6,)) + 0.1)
        assert np.all(np.isfinite(np.asarray(g)))


class TestEuler:
    def test_matches_scipy_xyz(self):
        ang = RNG.uniform(-np.pi, np.pi, size=(20, 3)).astype(np.float32)
        R = rot.euler_angles_to_matrix(jnp.asarray(ang), "XYZ")
        # pytorch3d XYZ == intrinsic rotations Rx @ Ry @ Rz == scipy "XYZ" intrinsic?
        # scipy from_euler('xyz', extrinsic) gives Rz@Ry@Rx; intrinsic 'XYZ' gives Rx@Ry@Rz.
        R_ref = SR.from_euler("XYZ", ang).as_matrix()
        np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)


class TestAxisAngle:
    def test_matches_scipy(self):
        v = RNG.normal(size=(30, 3)).astype(np.float32)
        R = rot.axis_angle_to_matrix(jnp.asarray(v))
        R_ref = SR.from_rotvec(v).as_matrix()
        np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)

    def test_zero_angle_identity_and_grad(self):
        R = rot.axis_angle_to_matrix(jnp.zeros((3,)))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        g = jax.grad(lambda v: jnp.sum(rot.axis_angle_to_matrix(v)))(jnp.zeros((3,)))
        assert np.all(np.isfinite(np.asarray(g)))


class TestAngles:
    def test_rotation_angle(self):
        ang = np.array([0.3, 1.2, 2.5], dtype=np.float32)
        axis = np.array([0, 1, 0], dtype=np.float32)
        R = SR.from_rotvec(ang[:, None] * axis).as_matrix().astype(np.float32)
        got = rot.so3_rotation_angle(jnp.asarray(R))
        np.testing.assert_allclose(np.asarray(got), ang, atol=1e-3)

    def test_relative_angle(self):
        R1 = random_rotations(16)
        R2 = random_rotations(16)
        # compare cosines (the acos clamp at ±(1-1e-4) makes raw angles
        # imprecise near 0 and pi — same guard as the reference)
        got = rot.so3_relative_angle(jnp.asarray(R1), jnp.asarray(R2), cos_angle=True)
        ref = np.array([np.cos(np.linalg.norm(SR.from_matrix(a @ b.T).as_rotvec()))
                        for a, b in zip(R1, R2)])
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)

    def test_pairwise_matches_loops(self):
        R = jnp.asarray(random_rotations(8))
        mask = jnp.array([1, 1, 1, 0, 1, 1, 0, 1], dtype=bool)
        vals, pmask = rot.so3_relative_angle_pairs(R, mask, cos_angle=True)
        for i in range(8):
            for j in range(8):
                expect = bool(i > j and mask[i] and mask[j])
                assert bool(pmask[i, j]) == expect
                if expect:
                    ref = rot.so3_relative_angle(R[i], R[j], cos_angle=True)
                    np.testing.assert_allclose(float(vals[i, j]), float(ref), atol=1e-5)
