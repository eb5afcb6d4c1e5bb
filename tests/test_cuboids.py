import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as SR

from weakcube_tpu.ops import cuboids as cub
from weakcube_tpu.ops import rotations as rot

K = jnp.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])


class TestVerts:
    def test_axis_aligned_unit(self):
        # box at origin, w=2 (z extent), h=4 (y extent), l=6 (x extent)
        box = jnp.array([0.0, 0, 0, 2, 4, 6])
        v = cub.get_cuboid_verts_3d(box)
        assert v.shape == (8, 3)
        v = np.asarray(v)
        np.testing.assert_allclose(sorted(set(np.round(v[:, 0], 5))), [-3, 3])
        np.testing.assert_allclose(sorted(set(np.round(v[:, 1], 5))), [-2, 2])
        np.testing.assert_allclose(sorted(set(np.round(v[:, 2], 5))), [-1, 1])
        # v0 = (-l/2, -h/2, -w/2) per the reference vertex diagram
        np.testing.assert_allclose(v[0], [-3, -2, -1])
        np.testing.assert_allclose(v[6], [3, 2, 1])

    def test_translation_and_rotation(self):
        boxes = jnp.asarray(np.random.default_rng(0).uniform(0.5, 3, size=(10, 6)).astype(np.float32))
        R = jnp.asarray(SR.random(10, rng=np.random.default_rng(3)).as_matrix().astype(np.float32))
        v = cub.get_cuboid_verts_3d(boxes, R)
        # centroid of corners == center
        np.testing.assert_allclose(np.asarray(v.mean(axis=1)), np.asarray(boxes[:, :3]), atol=1e-5)
        # pairwise distance v0-v6 is the full diagonal
        diag = np.linalg.norm(np.asarray(v[:, 0] - v[:, 6]), axis=-1)
        ref = np.linalg.norm(np.asarray(boxes[:, 3:6]), axis=-1)
        np.testing.assert_allclose(diag, ref, atol=1e-4)

    def test_volume_from_corners(self):
        box = jnp.array([1.0, 2, 5, 2, 3, 4])
        c = cub.Cubes.from_parts(box[None, :3], box[None, 3:6], jnp.eye(3)[None])
        np.testing.assert_allclose(float(c.volumes[0]), 24.0, atol=1e-5)


class TestProjection:
    def test_center_projects_to_principal_point(self):
        pts = jnp.array([[0.0, 0, 2]])
        uvz = cub.project_points(K, pts)
        np.testing.assert_allclose(np.asarray(uvz[0]), [320, 240, 2], atol=1e-5)

    def test_known_offset(self):
        pts = jnp.array([[1.0, -1.0, 5.0]])
        uvz = cub.project_points(K, pts)
        np.testing.assert_allclose(np.asarray(uvz[0]), [320 + 100, 240 - 100, 5], atol=1e-4)

    def test_convert_3d_box_to_2d_front(self):
        box = jnp.array([0.0, 0, 10, 2, 2, 2])
        b2d, behind, fully = cub.convert_3d_box_to_2d(K, box, jnp.eye(3), 640, 480, XYWH=False)
        assert not bool(behind) and not bool(fully)
        b = np.asarray(b2d)
        # nearest face at z=9: half extent 1m * 500 / 9 ≈ 55.6 px
        np.testing.assert_allclose(b, [320 - 500 / 9, 240 - 500 / 9, 320 + 500 / 9, 240 + 500 / 9], atol=1e-3)

    def test_behind_camera_flags(self):
        box = jnp.array([0.0, 0, -5.0, 1, 1, 1])
        _, behind, fully = cub.convert_3d_box_to_2d(K, box, jnp.eye(3), 640, 480)
        assert bool(behind) and bool(fully)

    def test_bube_corner_clamp(self):
        # a huge close box: projected corners must be clamped to the extended frame
        c = cub.Cubes.from_parts(jnp.array([[0.0, 0, 1.0]]), jnp.array([[50.0, 50, 50]]), jnp.eye(3)[None])
        uv = c.bube_corners(K, jnp.array([640.0, 480.0]))
        uvn = np.asarray(uv)
        assert uvn[..., 0].min() >= -320 + 1 - 1e-4 and uvn[..., 0].max() <= 2 * 640 - 1 + 1e-4
        assert uvn[..., 1].min() >= -240 + 1 - 1e-4 and uvn[..., 1].max() <= 2 * 480 - 1 + 1e-4

    def test_to_boxes_matches_minmax(self):
        rng = np.random.default_rng(5)
        centers = jnp.asarray(rng.uniform(-1, 1, (6, 3)).astype(np.float32) + np.array([0, 0, 8], np.float32))
        dims = jnp.asarray(rng.uniform(0.5, 2, (6, 3)).astype(np.float32))
        R = jnp.asarray(SR.random(6, rng=np.random.default_rng(6)).as_matrix().astype(np.float32))
        c = cub.Cubes.from_parts(centers, dims, R)
        boxes = c.to_boxes(K)
        uv = np.asarray(c.bube_corners(K))
        np.testing.assert_allclose(np.asarray(boxes),
                                   np.concatenate([uv.min(1), uv.max(1)], -1), atol=1e-4)


class TestAllocentric:
    def test_identity_at_principal_point(self):
        R = jnp.asarray(SR.random(4, rng=np.random.default_rng(7)).as_matrix().astype(np.float32))
        Kb = jnp.tile(K, (4, 1, 1))
        u = jnp.full((4,), 320.0)
        v = jnp.full((4,), 240.0)
        R_allo = cub.R_to_allocentric(Kb, R, u, v)
        np.testing.assert_allclose(np.asarray(R_allo), np.asarray(R), atol=1e-5)

    def test_roundtrip(self):
        R = jnp.asarray(SR.random(8, rng=np.random.default_rng(8)).as_matrix().astype(np.float32))
        Kb = jnp.tile(K, (8, 1, 1))
        u = jnp.asarray(np.random.default_rng(9).uniform(0, 640, 8).astype(np.float32))
        v = jnp.asarray(np.random.default_rng(10).uniform(0, 480, 8).astype(np.float32))
        R_allo = cub.R_to_allocentric(Kb, R, u, v)
        R_back = cub.R_from_allocentric(Kb, R_allo, u, v)
        np.testing.assert_allclose(np.asarray(R_back), np.asarray(R), atol=1e-4)

    def test_ray_alignment_property(self):
        # A rotation that is identity in allocentric space should map the
        # optical axis onto the viewing ray in egocentric space.
        u, v = jnp.array([500.0]), jnp.array([100.0])
        Kb = K[None]
        R_ego = cub.R_from_allocentric(Kb, jnp.eye(3)[None], u, v)
        z_axis = np.asarray(R_ego[0] @ jnp.array([0.0, 0, 1]))
        ray = np.array([(500 - 320) / 500, (100 - 240) / 500, 1.0])
        ray = ray / np.linalg.norm(ray)
        np.testing.assert_allclose(z_axis, ray, atol=1e-5)


class TestMisc:
    def test_virtual_scale(self):
        assert float(cub.compute_virtual_scale_from_focal_spaces(512.0, 512.0, 500.0, 480.0)) == (480.0 * 512.0) / (500.0 * 512.0)

    def test_scaled_sigmoid(self):
        x = jnp.array([-100.0, 0.0, 100.0])
        y = np.asarray(cub.scaled_sigmoid(x, jnp.array(2.0), jnp.array(4.0)))
        np.testing.assert_allclose(y, [2.0, 3.0, 4.0], atol=1e-4)

    def test_backproject_roundtrip(self):
        pts = jnp.array([[0.5, -0.3, 4.0], [1.0, 2.0, 9.0]])
        uvz = cub.project_points(K, pts)
        back = cub.backproject(uvz[:, :2], uvz[:, 2], K)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)

    def test_jit_and_vmap(self):
        f = jax.jit(lambda b, R: cub.convert_3d_box_to_2d(K, b, R, 640, 480)[0])
        boxes = jnp.asarray(np.random.default_rng(1).uniform(1, 3, (4, 6)).astype(np.float32))
        boxes = boxes.at[:, 2].add(5.0)
        R = jnp.tile(jnp.eye(3), (4, 1, 1))
        out = f(boxes, R)
        assert out.shape == (4, 4) and np.all(np.isfinite(np.asarray(out)))
