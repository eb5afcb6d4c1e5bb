import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weakcube_tpu.ops import losses, nms, plane, roi_align, sampling
from weakcube_tpu.ops.hull import soft_hull_mask


def np_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a + b - inter + 1e-12) > thr:
                suppressed[j] = True
    return sorted(keep)


class TestNMS:
    def test_matches_numpy_greedy(self):
        rng = np.random.default_rng(0)
        xy = rng.uniform(0, 80, (64, 2))
        wh = rng.uniform(5, 40, (64, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.uniform(0, 1, 64).astype(np.float32)
        keep = nms.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
        got = sorted(np.nonzero(np.asarray(keep))[0].tolist())
        assert got == np_greedy_nms(boxes, scores, 0.5)

    def test_valid_mask_respected(self):
        boxes = jnp.array([[0.0, 0, 10, 10], [100, 100, 110, 110]])
        scores = jnp.array([0.9, 0.8])
        keep = nms.nms_mask(boxes, scores, 0.5, valid=jnp.array([True, False]))
        assert bool(keep[0]) and not bool(keep[1])

    def test_batched_classes_dont_suppress(self):
        boxes = jnp.array([[0.0, 0, 10, 10], [0, 0, 10, 10]])
        scores = jnp.array([0.9, 0.8])
        keep = nms.batched_nms_mask(boxes, scores, jnp.array([0, 1]), 0.5)
        assert bool(keep[0]) and bool(keep[1])
        keep_same = nms.batched_nms_mask(boxes, scores, jnp.array([0, 0]), 0.5)
        assert bool(keep_same[0]) and not bool(keep_same[1])

    def test_topk_after_nms(self):
        boxes = jnp.array([[0.0, 0, 10, 10], [20, 20, 30, 30], [0, 0, 10, 10]])
        scores = jnp.array([0.9, 0.5, 0.8])
        keep = nms.nms_mask(boxes, scores, 0.5)
        bk, sk, vk, _ = nms.topk_after_nms(boxes, scores, keep, 4)
        assert bk.shape == (4, 4)
        assert np.asarray(vk).sum() == 2
        np.testing.assert_allclose(np.asarray(sk[:2]), [0.9, 0.5])


class TestROIAlign:
    def _pyramid(self, B=1, C=4):
        rng = np.random.default_rng(1)
        feats = []
        for i, s in enumerate([4, 8, 16, 32, 64]):
            H, W = 256 // s, 256 // s
            feats.append(jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)))
        return feats

    def test_constant_map_pools_constant(self):
        feats = [jnp.full((1, 256 // s, 256 // s, 2), 3.5) for s in [4, 8, 16, 32, 64]]
        boxes = jnp.array([[[10.0, 10, 100, 80], [0, 0, 250, 250]]])
        out = roi_align.multilevel_roi_align(feats, boxes, (4, 8, 16, 32, 64), 7)
        np.testing.assert_allclose(np.asarray(out), 3.5, atol=1e-5)

    def test_linear_ramp_exact(self):
        # f(x, y) = x_img: bilinear sampling of a linear fn is exact, pooled
        # bin value == mean x of the bin's sample points.
        s = 4
        H = W = 64
        xs = (np.arange(W) + 0.0)
        fmap = np.tile(xs[None, :, None], (H, 1, 1)).astype(np.float32)[None]
        feats = [jnp.asarray(fmap)]
        box = jnp.array([[[8.0, 8, 120, 120]]])  # image coords; level fixed (one level)
        out = roi_align.multilevel_roi_align(feats, box, (s,), output_size=4, min_level=2)
        got = np.asarray(out)[0, 0, 0, :, 0]  # first row, x varies
        # feature-space box: [8/4-0.5, 120/4-0.5] = [1.5, 29.5], bin w = 7
        # bin i sample xs at 1.5 + 7*i + 7*(0.25, 0.75) -> mean = 1.5+7i+3.5
        expect = 1.5 + 7 * np.arange(4) + 3.5
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_level_assignment(self):
        boxes = jnp.array([[10.0, 10, 42, 42], [0, 0, 224, 224], [0, 0, 1000, 1000]])
        lv = roi_align.assign_fpn_levels(boxes, 2, 6)
        assert lv[0] == 2 and lv[1] == 4 and lv[2] == 6

    def test_shapes_and_finite(self):
        feats = self._pyramid()
        boxes = jnp.asarray(np.random.default_rng(2).uniform(0, 200, (1, 16, 4)).astype(np.float32))
        boxes = jnp.concatenate([boxes[..., :2], boxes[..., :2] + jnp.abs(boxes[..., 2:]) + 1], -1)
        out = roi_align.multilevel_roi_align(feats, boxes, (4, 8, 16, 32, 64), 7)
        assert out.shape == (1, 16, 7, 7, 4)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_matmul_fwd_matches_gather(self):
        # the dense-contraction forward must reproduce the gather forward's
        # clamped bilinear sampling plan exactly (f32: tight tolerance),
        # including multi-level assignment, edge-clamped boxes and
        # degenerate/padded RoIs
        feats = self._pyramid(B=2, C=8)
        rng = np.random.default_rng(7)
        xy = rng.uniform(0, 250, (2, 9, 2))
        wh = rng.uniform(1, 200, (2, 9, 2))
        boxes = np.concatenate([xy - wh / 2, xy + wh / 2], -1)
        boxes[0, 3] = [40, 40, 40, 40]       # degenerate
        boxes[1, 5] = [-30, -30, 400, 400]   # out of bounds (clamps)
        boxes = jnp.asarray(boxes.astype(np.float32))
        ref = roi_align.multilevel_roi_align(
            feats, boxes, (4, 8, 16, 32, 64), 7, 2)
        got = roi_align.matmul_fwd(feats, boxes, (4, 8, 16, 32, 64), 7, 2,
                                   chunk=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_matmul_level_skip_exact(self):
        """TPU.ROI_ALIGN_LEVEL_SKIP (sort-by-level + cond-skip inactive
        chunks) must be BIT-exact vs the plain matmul plan in both
        directions — the skipped work is exactly the all-zero-masked case
        and the output unsort restores per-RoI order."""
        feats = self._pyramid(B=2, C=8)
        rng = np.random.default_rng(9)
        xy = rng.uniform(-20, 240, (2, 16, 2)).astype(np.float32)
        wh = rng.uniform(4, 260, (2, 16, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        strides = (4, 8, 16, 32, 64)

        base = roi_align.matmul_fwd(feats, boxes, strides, 7, 2, 2, chunk=4)
        skip = roi_align.matmul_fwd(feats, boxes, strides, 7, 2, 2, chunk=4,
                                    level_skip=True)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(skip))

        g = jnp.asarray(rng.normal(size=base.shape).astype(np.float32))
        shapes = tuple(f.shape for f in feats)
        dtypes = tuple(f.dtype for f in feats)
        gb = roi_align.matmul_bwd(shapes, dtypes, boxes, g, strides, 7, 2, 2,
                                  chunk=4)
        gs = roi_align.matmul_bwd(shapes, dtypes, boxes, g, strides, 7, 2, 2,
                                  chunk=4, level_skip=True)
        for a, b in zip(gb, gs):
            # summation order within a level's chunk scan is unchanged
            # (same chunks, same order; skipped ones added exact zeros)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("plan", ["matmul", "windowed"])
    def test_trainable_grad_matches_autodiff(self, plan):
        """Both custom_vjp plans on the XLA gather forward (matmul = the
        training-path default, windowed = the scatter plan) must produce the
        same feature gradients as autodiff of the plain gather formulation —
        including RoIs clamped to level borders and boxes hanging off the
        image."""
        feats = self._pyramid(B=2, C=4)
        rng = np.random.default_rng(3)
        xy = rng.uniform(-20, 240, (2, 12, 2)).astype(np.float32)
        wh = rng.uniform(4, 260, (2, 12, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        tup = tuple(feats)

        def loss_trainable(fs):
            out = roi_align.multilevel_roi_align_trainable(
                fs, boxes, (4, 8, 16, 32, 64), 7, 2, 2, plan)
            return jnp.sum(out * (1.0 + jnp.arange(out.size).reshape(out.shape)
                                  % 5))

        def loss_plain(fs):
            out = roi_align.multilevel_roi_align(
                list(fs), boxes, (4, 8, 16, 32, 64), 7, 2)
            return jnp.sum(out * (1.0 + jnp.arange(out.size).reshape(out.shape)
                                  % 5))

        g_t = jax.grad(loss_trainable)(tup)
        g_p = jax.grad(loss_plain)(tup)
        assert np.allclose(np.asarray(loss_trainable(tup)),
                           np.asarray(loss_plain(tup)), rtol=1e-5)
        for a, b in zip(g_t, g_p):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


class TestSampling:
    def test_counts(self):
        key = jax.random.PRNGKey(0)
        valid = jnp.arange(100) < 60
        m = sampling.uniform_topk_mask(key, valid, 20)
        assert int(m.sum()) == 20
        assert not np.any(np.asarray(m)[60:])

    def test_fewer_valid_than_k(self):
        m = sampling.uniform_topk_mask(jax.random.PRNGKey(1), jnp.arange(10) < 3, 8)
        assert int(m.sum()) == 3

    def test_weighted_bias(self):
        # heavily weighted item should be picked almost always
        key = jax.random.PRNGKey(2)
        lw = jnp.zeros(50).at[7].set(10.0)
        picks = 0
        for i in range(30):
            m = sampling.gumbel_topk_mask(jax.random.fold_in(key, i), lw, jnp.ones(50, bool), 5)
            picks += int(m[7])
        assert picks >= 29

    def test_fg_bg_budget(self):
        key = jax.random.PRNGKey(3)
        is_fg = jnp.arange(200) < 10       # only 10 fg
        is_bg = jnp.arange(200) >= 100
        fg, bg = sampling.sample_fg_bg(key, is_fg, is_bg, 64, 0.25)
        assert int(fg.sum()) == 10         # all fg kept (budget was 16)
        assert int(bg.sum()) == 54         # fills to 64

    def test_rank_budget_mask_matches_argsort(self):
        # the top-k cut must reproduce the full argsort+rank mask exactly
        # (continuous scores -> no ties) for every budget incl. 0 and >valid
        rng = np.random.default_rng(11)
        scores = jnp.asarray(rng.normal(size=300).astype(np.float32))
        valid = jnp.asarray(rng.random(300) < 0.4)
        for budget in (0, 1, 17, 64, 200):
            got = sampling.rank_budget_mask(scores, valid,
                                            jnp.asarray(budget), 200)
            s = np.where(np.asarray(valid), np.asarray(scores), -1e10)
            order = np.argsort(-s, kind="stable")
            rank = np.empty_like(order)
            rank[order] = np.arange(order.size)
            want = np.asarray(valid) & (rank < budget)
            np.testing.assert_array_equal(np.asarray(got), want,
                                          err_msg=f"budget={budget}")


class TestLosses:
    def test_focal_matches_manual(self):
        logits = jnp.array([0.5, -1.0, 2.0])
        targets = jnp.array([1.0, 0.0, 1.0])
        got = np.asarray(losses.sigmoid_focal_loss(logits, targets))
        p = 1 / (1 + np.exp(-np.asarray(logits)))
        ce = -(np.asarray(targets) * np.log(p) + (1 - np.asarray(targets)) * np.log(1 - p))
        pt = p * np.asarray(targets) + (1 - p) * (1 - np.asarray(targets))
        at = 0.25 * np.asarray(targets) + 0.75 * (1 - np.asarray(targets))
        np.testing.assert_allclose(got, at * ce * (1 - pt) ** 2, atol=1e-5)

    def test_masked_mean_skips_nan(self):
        x = jnp.array([1.0, jnp.nan, 3.0, 100.0])
        m = jnp.array([True, True, True, False])
        np.testing.assert_allclose(float(losses.masked_mean(x, m)), 2.0)

    def test_masked_mean_all_masked_is_zero(self):
        assert float(losses.masked_mean(jnp.array([jnp.nan]), jnp.array([True]))) == 0.0

    def test_ce(self):
        logits = jnp.array([[2.0, 1.0, 0.1]])
        got = float(losses.softmax_cross_entropy(logits, jnp.array([0]))[0])
        ref = -np.log(np.exp(2) / np.exp([2, 1, 0.1]).sum())
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestPlane:
    def test_recovers_ground_plane(self):
        rng = np.random.default_rng(4)
        n_in, n_out = 400, 100
        xz = rng.uniform(-5, 5, (n_in, 2))
        y = 1.5 + 0.01 * rng.normal(size=n_in)  # ground at y=1.5 (camera y down)
        pts_in = np.stack([xz[:, 0], y, xz[:, 1] + 6], -1)
        pts_out = rng.uniform(-3, 3, (n_out, 3)) + np.array([0, -1, 6])
        pts = jnp.asarray(np.concatenate([pts_in, pts_out]).astype(np.float32))
        eq, inliers = plane.ransac_plane(jax.random.PRNGKey(0), pts, thresh=0.05)
        up = plane.up_vector_from_plane(eq)
        # normal should be (0, ±1, 0); up vector convention: y negative
        np.testing.assert_allclose(np.abs(np.asarray(eq[:3])), [0, 1, 0], atol=0.03)
        assert float(up[1]) < 0
        assert int(inliers.sum()) > 350

    def test_ransac_hypothesis_count_accuracy(self):
        """Pins the cfg.TPU.RANSAC_HYPOTHESES accuracy/cost trade: on a
        realistic indoor scene (60% ground inliers at 1 cm noise + furniture
        clutter), 256 and 128 hypotheses recover the same plane as the
        reference's 1000 (Plane_torch maxIteration). Licenses cutting the
        in-graph per-step RANSAC cost under the backbone split."""
        def angular_err_deg(nh, seed):
            rng = np.random.default_rng(100 + seed)
            n_in, n_out = 600, 400
            xz = rng.uniform(-4, 4, (n_in, 2))
            y = 1.4 + 0.01 * rng.normal(size=n_in)
            pts_in = np.stack([xz[:, 0], y, xz[:, 1] + 5], -1)
            # clutter: boxes of points above the ground (furniture/walls)
            pts_out = rng.uniform(0, 1, (n_out, 3)) * [6, 1.3, 5] + [-3, 0, 3]
            pts = jnp.asarray(np.concatenate([pts_in, pts_out]).astype(np.float32))
            eq, _ = plane.ransac_plane(jax.random.PRNGKey(seed), pts,
                                       thresh=0.05, num_hypotheses=nh)
            n = np.asarray(eq[:3])
            cos = abs(n @ [0.0, 1.0, 0.0]) / max(np.linalg.norm(n), 1e-9)
            return np.degrees(np.arccos(min(cos, 1.0)))

        for nh in (1000, 256, 128):
            errs = [angular_err_deg(nh, s) for s in range(6)]
            assert np.median(errs) < 1.0, (nh, errs)
            assert max(errs) < 2.0, (nh, errs)

    def test_masked_points_ignored(self):
        rng = np.random.default_rng(5)
        pts_in = np.stack([rng.uniform(-5, 5, 200), np.full(200, 2.0), rng.uniform(4, 10, 200)], -1)
        junk = rng.uniform(-50, 50, (100, 3))
        pts = jnp.asarray(np.concatenate([pts_in, junk]).astype(np.float32))
        valid = jnp.arange(300) < 200
        eq, inl = plane.ransac_plane(jax.random.PRNGKey(1), pts, valid=valid, thresh=0.05)
        np.testing.assert_allclose(np.abs(np.asarray(eq[:3])), [0, 1, 0], atol=0.02)
        assert not np.any(np.asarray(inl)[200:])


class TestHull:
    def test_square_hull(self):
        # 4 corners of a square + center point; hull mask == square fill
        pts = jnp.array([[2.0, 2], [10, 2], [10, 10], [2, 10], [6, 6]])
        mask = soft_hull_mask(pts, 14, 14)
        m = np.asarray(mask)
        assert m[6, 6] == 1.0          # inside
        assert m[0, 0] == 0.0          # outside
        assert m[12, 12] == 0.0
        # soft fill excludes the zero-valued boundary: strict interior is 7x7
        # (same semantics as the reference fill_polygon's clip(v, 0, 1))
        assert m.sum() == 49

    def test_differentiable(self):
        # the soft band has width 1/|edge| in pixels (the signed value is
        # cross-product-scaled, as in the reference fill_polygon), so pick
        # corners whose bottom edge passes within that band of pixel (4, 2):
        # val = 4*(2-1.96) - 0.08*(4-2.5) = 0.04 in (0, 1) -> gradient flows
        pts = jnp.array([[2.5, 1.96], [6.5, 2.04], [6.9, 6.5], [2.1, 6.4]])
        g = jax.grad(lambda p: jnp.sum(soft_hull_mask(p, 14, 14)))(pts)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)

    def test_octagon_from_8pts(self):
        rng = np.random.default_rng(6)
        pts = jnp.asarray(rng.uniform(3, 25, (8, 2)).astype(np.float32))
        mask = np.asarray(soft_hull_mask(pts, 30, 30))
        from scipy.spatial import ConvexHull, Delaunay
        hull = ConvexHull(np.asarray(pts))
        tri = Delaunay(np.asarray(pts)[hull.vertices])
        ys, xs = np.mgrid[0:30, 0:30]
        inside = tri.find_simplex(np.stack([xs.ravel(), ys.ravel()], -1)) >= 0
        inside = inside.reshape(30, 30)
        # hard region agreement away from soft 1px boundary
        interior = (mask == 1.0)
        exterior = (mask == 0.0)
        assert np.all(inside[interior])
        # exterior pixels more than ~2px from hull must be marked inside=False
        disagree = exterior & inside
        # allow a thin boundary band
        assert disagree.mean() < 0.03
