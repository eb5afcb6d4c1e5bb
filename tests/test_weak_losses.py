"""Semantic unit tests for the weak-supervision losses: each loss must
vanish (or be minimal) at its intended optimum and be positive away from it."""
import jax
import jax.numpy as jnp
import numpy as np

from weakcube_tpu.models import roi_heads as rh
from weakcube_tpu.ops import cuboids as cub


K = jnp.tile(jnp.asarray(np.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]],
                                  np.float32)), (1, 1, 1))
WH = jnp.asarray([[128.0, 128.0]])


def make_cubes(centers, dims, yaws=None):
    n = len(centers)
    Rs = []
    for i in range(n):
        t = 0.0 if yaws is None else yaws[i]
        c, s = np.cos(t), np.sin(t)
        Rs.append(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32))
    return cub.Cubes.from_parts(jnp.asarray(np.asarray(centers, np.float32))[None],
                                jnp.asarray(np.asarray(dims, np.float32))[None],
                                jnp.asarray(np.stack(Rs))[None])


class TestIoUProjection:
    def test_zero_when_projection_matches(self):
        cubes = make_cubes([[0, 0, 5.0]], [[1, 1, 1.0]])
        proj = cubes.to_boxes(K[:, None], WH[:, None])
        loss = rh.iou_projection_loss(proj, proj)
        np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-6)

    def test_positive_when_offset(self):
        cubes = make_cubes([[0, 0, 5.0]], [[1, 1, 1.0]])
        proj = cubes.to_boxes(K[:, None], WH[:, None])
        shifted = proj + 30.0
        assert float(rh.iou_projection_loss(shifted, proj)[0, 0]) > 0.3


class TestPoseAlignment:
    def test_zero_for_identical_poses(self):
        pose = jnp.tile(jnp.eye(3), (1, 4, 1, 1))
        fg = jnp.ones((1, 4), bool)
        loss, has = rh.pose_alignment_loss(pose, fg)
        assert bool(has)
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-3)

    def test_positive_for_mixed_poses(self):
        c, s = np.cos(1.0), np.sin(1.0)
        R2 = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        pose = jnp.asarray(np.stack([np.eye(3, dtype=np.float32), R2])[None])
        fg = jnp.ones((1, 2), bool)
        loss, has = rh.pose_alignment_loss(pose, fg)
        assert bool(has) and float(loss) > 0.05

    def test_single_box_images_skipped(self):
        pose = jnp.tile(jnp.eye(3), (1, 4, 1, 1))
        fg = jnp.asarray([[True, False, False, False]])
        _, has = rh.pose_alignment_loss(pose, fg)
        assert not bool(has)  # reference returns None when no image has >=2


class TestPoseGround:
    def test_zero_when_up_matches_normal(self):
        pose = jnp.tile(jnp.eye(3), (1, 2, 1, 1))  # up row = (0, 1, 0)
        normals = jnp.asarray([[0.0, 1.0, 0.0]])
        loss = rh.pose_ground_loss(pose, normals)
        np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-5)

    def test_abs_cos_symmetric(self):
        pose = jnp.tile(jnp.eye(3), (1, 1, 1, 1))
        up = rh.pose_ground_loss(pose, jnp.asarray([[0.0, 1.0, 0.0]]))
        down = rh.pose_ground_loss(pose, jnp.asarray([[0.0, -1.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(up), np.asarray(down), atol=1e-6)

    def test_orthogonal_is_one(self):
        pose = jnp.tile(jnp.eye(3), (1, 1, 1, 1))
        loss = rh.pose_ground_loss(pose, jnp.asarray([[1.0, 0.0, 0.0]]))
        np.testing.assert_allclose(float(loss[0, 0]), 1.0, atol=1e-5)


class TestPseudoZ:
    def test_point_loss_zero_at_depth(self):
        depth = jnp.full((1, 128, 128), 7.0)
        xy = jnp.asarray([[[64.0, 64.0]]])
        z = jnp.asarray([[7.0]])
        loss = rh.pseudo_gt_z_point_loss(depth, xy, z, WH[0])
        np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-6)

    def test_box_loss_uses_median(self):
        # depth: half 4.0, half 10.0 inside the box -> median ~ one of them
        d = np.full((128, 128), 4.0, np.float32)
        d[:, 64:] = 10.0
        depth = jnp.asarray(d)[None]
        boxes = jnp.asarray([[[32.0, 32, 96, 96]]])  # spans the boundary
        z = jnp.asarray([[4.0]])
        loss = float(rh.pseudo_gt_z_box_loss(depth, boxes, z, WH[0])[0, 0])
        assert loss <= 6.0 + 1e-5  # median in [4, 10]
        z_far = jnp.asarray([[100.0]])
        assert float(rh.pseudo_gt_z_box_loss(depth, boxes, z_far, WH[0])[0, 0]) > 80


class TestDimsPrior:
    def test_hinge_inside_one_sigma(self):
        priors = np.tile(np.array([[[1.0, 1, 1], [0.5, 0.5, 0.5]]], np.float32),
                         (3, 1, 1))
        dims = jnp.asarray([[[1.2, 0.8, 1.0]]])  # all within 1 sigma
        cls = jnp.zeros((1, 1), jnp.int32)
        s = rh.dims_prior_loss(dims, cls, priors)
        np.testing.assert_allclose(np.asarray(s), 0.0, atol=1e-6)

    def test_penalises_outliers(self):
        priors = np.tile(np.array([[[1.0, 1, 1], [0.1, 0.1, 0.1]]], np.float32),
                         (3, 1, 1))
        dims = jnp.asarray([[[2.0, 1.0, 1.0]]])  # w is 10 sigma out
        cls = jnp.zeros((1, 1), jnp.int32)
        s = np.asarray(rh.dims_prior_loss(dims, cls, priors))
        assert s[0, 0, 0] > 8.0 and s[0, 0, 1] < 1e-6


class TestZAreaSearch:
    def test_zero_when_projection_area_matches(self):
        cubes = make_cubes([[0, 0, 5.0]], [[1, 1, 1.0]])
        gt = cubes.to_boxes(K[:, None], WH[:, None])
        loss = rh.z_area_search_loss(gt, cubes, K, WH)
        np.testing.assert_allclose(float(loss[0, 0]), 0.0, atol=1e-5)

    def test_pushes_z_toward_matching_area(self):
        # cube at z=5; GT box drawn from the same cube at z=8 (smaller area)
        far = make_cubes([[0, 0, 8.0]], [[1, 1, 1.0]])
        gt = far.to_boxes(K[:, None], WH[:, None])
        near = make_cubes([[0, 0, 5.0]], [[1, 1, 1.0]])
        loss = float(rh.z_area_search_loss(gt, near, K, WH)[0, 0])
        # |5 - ~8| / 2 ~ 1.5
        assert 1.0 < loss < 2.2


class TestGroundNormals:
    def test_recovers_synthetic_ground(self):
        # ground plane y = 1.2 in camera coords
        H = W = 120
        u, v = np.meshgrid(np.arange(W), np.arange(H))
        fy = 100.0
        denom = np.maximum(v - H / 2, 1e-3)
        depth = np.where(v > H / 2, fy * 1.2 / denom, 30.0).astype(np.float32)
        dm = jnp.asarray(depth)[None]
        gm = jnp.asarray(v > H / 2)[None]
        Kb = jnp.asarray(np.array([[fy, 0, W / 2], [0, fy, H / 2], [0, 0, 1]],
                                  np.float32))[None]
        n = rh.ground_normals_from_maps(jax.random.PRNGKey(0), dm, gm,
                                        jnp.ones((1,), bool), K=Kb)
        nn = np.asarray(n[0])
        assert abs(nn[1]) > 0.95  # up-dominant normal
