import jax.numpy as jnp
import numpy as np
from scipy.spatial import ConvexHull, HalfspaceIntersection
from scipy.spatial.transform import Rotation as SR

from weakcube_tpu.ops import cuboids as cub
from weakcube_tpu.ops import iou3d


def make_corners(center, whl, R=None):
    box = jnp.asarray(np.concatenate([center, whl]).astype(np.float32))
    Rm = jnp.asarray(R.astype(np.float32)) if R is not None else jnp.eye(3)
    return cub.get_cuboid_verts_3d(box, Rm)


def ref_intersection_volume(c1, c2):
    """scipy reference: halfspace intersection of the 12 planes."""
    halfspaces = []
    for c in (np.asarray(c1), np.asarray(c2)):
        center = c.mean(0)
        quads = [[0, 1, 2, 3], [1, 5, 6, 2], [4, 0, 3, 7],
                 [5, 4, 7, 6], [4, 5, 1, 0], [3, 2, 6, 7]]
        for q in quads:
            pts = c[q]
            n = np.cross(pts[1] - pts[0], pts[2] - pts[0])
            n = n / np.linalg.norm(n)
            if np.dot(n, pts.mean(0) - center) < 0:
                n = -n
            # n.x <= n.p0  ->  [n, -n.p0]
            halfspaces.append(np.concatenate([n, [-np.dot(n, pts[0])]]))
    halfspaces = np.asarray(halfspaces)
    # interior point: try midpoint of centers
    ip = (np.asarray(c1).mean(0) + np.asarray(c2).mean(0)) / 2
    if np.any(halfspaces[:, :3] @ ip + halfspaces[:, 3] > -1e-9):
        return None  # no simple interior point; caller skips
    hs = HalfspaceIntersection(halfspaces, ip)
    return ConvexHull(hs.intersections).volume


class TestIoU3D:
    def test_identical(self):
        c = make_corners(np.array([0.0, 0, 5]), np.array([2.0, 3, 4]))
        _, iou = iou3d.pairwise_iou3d(c[None], c[None])
        np.testing.assert_allclose(float(iou[0, 0]), 1.0, atol=1e-4)

    def test_axis_aligned_partial(self):
        c1 = make_corners(np.array([0.0, 0, 0]), np.array([2.0, 2, 2]))
        c2 = make_corners(np.array([1.0, 0, 0]), np.array([2.0, 2, 2]))
        # boxes are 2x2x2 cubes offset by 1 along x -> inter = 1*2*2 = 4
        inter, iou = iou3d.pairwise_iou3d(c1[None], c2[None])
        np.testing.assert_allclose(float(inter[0, 0]), 4.0, atol=1e-4)
        np.testing.assert_allclose(float(iou[0, 0]), 4.0 / 12.0, atol=1e-4)

    def test_disjoint(self):
        c1 = make_corners(np.array([0.0, 0, 0]), np.array([1.0, 1, 1]))
        c2 = make_corners(np.array([5.0, 0, 0]), np.array([1.0, 1, 1]))
        _, iou = iou3d.pairwise_iou3d(c1[None], c2[None])
        np.testing.assert_allclose(float(iou[0, 0]), 0.0, atol=1e-6)

    def test_contained(self):
        c1 = make_corners(np.array([0.0, 0, 0]), np.array([4.0, 4, 4]))
        c2 = make_corners(np.array([0.0, 0, 0]), np.array([2.0, 2, 2]))
        inter, iou = iou3d.pairwise_iou3d(c1[None], c2[None])
        np.testing.assert_allclose(float(inter[0, 0]), 8.0, atol=1e-3)
        np.testing.assert_allclose(float(iou[0, 0]), 8.0 / 64.0, atol=1e-4)

    def test_rotated_45_self_overlap(self):
        # unit cube vs itself rotated 45 deg about y: intersection is a
        # regular octagonal prism; analytic volume = 2*(sqrt(2)-1) for unit cube
        c1 = make_corners(np.array([0.0, 0, 0]), np.array([1.0, 1, 1]))
        R = SR.from_euler("y", 45, degrees=True).as_matrix()
        c2 = make_corners(np.array([0.0, 0, 0]), np.array([1.0, 1, 1]), R)
        inter, _ = iou3d.pairwise_iou3d(c1[None], c2[None])
        expect = 8 * (np.sqrt(2) - 1) / 4  # = 2(sqrt2-1) ~ 0.8284
        np.testing.assert_allclose(float(inter[0, 0]), expect, atol=1e-3)

    def test_random_vs_scipy(self):
        rng = np.random.default_rng(11)
        n_checked = 0
        for trial in range(12):
            ctr1 = rng.uniform(-0.5, 0.5, 3)
            ctr2 = rng.uniform(-0.5, 0.5, 3)
            whl1 = rng.uniform(0.8, 2.0, 3)
            whl2 = rng.uniform(0.8, 2.0, 3)
            R1 = SR.random(rng=rng).as_matrix()
            R2 = SR.random(rng=rng).as_matrix()
            c1 = make_corners(ctr1, whl1, R1)
            c2 = make_corners(ctr2, whl2, R2)
            ref = ref_intersection_volume(c1, c2)
            if ref is None:
                continue
            inter, _ = iou3d.pairwise_iou3d(c1[None], c2[None])
            np.testing.assert_allclose(float(inter[0, 0]), ref, rtol=2e-3, atol=1e-4)
            n_checked += 1
        assert n_checked >= 5

    def test_matched_matches_pairwise_diag(self):
        rng = np.random.default_rng(3)
        cs1 = jnp.stack([make_corners(rng.uniform(-1, 1, 3), rng.uniform(0.5, 2, 3),
                                      SR.random(rng=rng).as_matrix()) for _ in range(4)])
        cs2 = jnp.stack([make_corners(rng.uniform(-1, 1, 3), rng.uniform(0.5, 2, 3),
                                      SR.random(rng=rng).as_matrix()) for _ in range(4)])
        _, full = iou3d.pairwise_iou3d(cs1, cs2)
        diag = iou3d.matched_iou3d(cs1, cs2)
        np.testing.assert_allclose(np.asarray(diag), np.diag(np.asarray(full)), atol=1e-5)

    def test_volume(self):
        c = make_corners(np.array([1.0, -2, 3]), np.array([2.0, 3, 4]),
                         SR.from_euler("xz", [20, 50], degrees=True).as_matrix())
        np.testing.assert_allclose(float(iou3d.box_volume(c)), 24.0, atol=1e-3)
