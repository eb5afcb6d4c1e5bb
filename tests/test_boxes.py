import jax.numpy as jnp
import numpy as np

from weakcube_tpu.ops import boxes as B


class TestIoU:
    def test_pairwise_golden(self):
        a = jnp.array([[0.0, 0, 10, 10], [5, 5, 15, 15]])
        b = jnp.array([[0.0, 0, 10, 10], [10, 10, 20, 20], [0, 0, 5, 5]])
        iou = np.asarray(B.pairwise_iou(a, b))
        np.testing.assert_allclose(iou[0, 0], 1.0)
        np.testing.assert_allclose(iou[0, 1], 0.0)
        np.testing.assert_allclose(iou[0, 2], 25.0 / 100.0)
        np.testing.assert_allclose(iou[1, 1], 25.0 / 175.0)

    def test_degenerate_no_nan(self):
        a = jnp.zeros((2, 4))
        b = jnp.array([[0.0, 0, 4, 4]])
        assert np.all(np.isfinite(np.asarray(B.pairwise_iou(a, b))))

    def test_ioa(self):
        a = jnp.array([[0.0, 0, 10, 10]])
        b = jnp.array([[5.0, 5, 15, 15]])
        np.testing.assert_allclose(np.asarray(B.pairwise_ioa(a, b))[0, 0], 25.0 / 100.0)

    def test_elementwise_matches_pairwise_diag(self):
        rng = np.random.default_rng(0)
        x1y1 = rng.uniform(0, 50, (16, 2))
        wh = rng.uniform(1, 30, (16, 2))
        a = jnp.asarray(np.concatenate([x1y1, x1y1 + wh], -1).astype(np.float32))
        x1y1b = rng.uniform(0, 50, (16, 2))
        whb = rng.uniform(1, 30, (16, 2))
        b = jnp.asarray(np.concatenate([x1y1b, x1y1b + whb], -1).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(B.elementwise_iou(a, b)),
            np.diag(np.asarray(B.pairwise_iou(a, b))), atol=1e-6)


class TestGIoU:
    def test_identical_is_one(self):
        a = jnp.array([[0.0, 0, 10, 10]])
        np.testing.assert_allclose(np.asarray(B.giou(a, a)), [1.0], atol=1e-6)

    def test_disjoint_negative(self):
        a = jnp.array([[0.0, 0, 1, 1]])
        b = jnp.array([[9.0, 9, 10, 10]])
        assert float(B.giou(a, b)[0]) < 0

    def test_golden(self):
        # inter=25, union=175, enclosing=225 -> giou = 25/175 - 50/225
        a = jnp.array([[0.0, 0, 10, 10]])
        b = jnp.array([[5.0, 5, 15, 15]])
        np.testing.assert_allclose(float(B.giou(a, b)[0]), 25 / 175 - 50 / 225, atol=1e-6)


class TestDeltas:
    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        src = np.concatenate([rng.uniform(0, 50, (32, 2)), rng.uniform(60, 100, (32, 2))], -1)
        tgt = np.concatenate([rng.uniform(0, 50, (32, 2)), rng.uniform(60, 100, (32, 2))], -1)
        d = B.get_deltas(jnp.asarray(src, jnp.float32), jnp.asarray(tgt, jnp.float32))
        back = B.apply_deltas(d, jnp.asarray(src, jnp.float32))
        np.testing.assert_allclose(np.asarray(back), tgt, atol=5e-3)  # fp32 exp/log roundtrip

    def test_weights(self):
        src = jnp.array([[0.0, 0, 10, 10]])
        tgt = jnp.array([[1.0, 0, 11, 10]])  # shift cx by 1 (w=10 -> dx=0.1)
        d = B.get_deltas(src, tgt, weights=(10.0, 5.0, 1.0, 1.0))
        np.testing.assert_allclose(float(d[0, 0]), 1.0, atol=1e-5)

    def test_clamp_no_overflow(self):
        d = jnp.array([[0.0, 0.0, 50.0, 50.0]])
        out = B.apply_deltas(d, jnp.array([[0.0, 0, 10, 10]]))
        assert np.all(np.isfinite(np.asarray(out)))


class TestMisc:
    def test_xywh_roundtrip(self):
        b = jnp.array([[3.0, 4, 10, 20]])
        np.testing.assert_allclose(np.asarray(B.xyxy_to_xywh(B.xywh_to_xyxy(b))), np.asarray(b))

    def test_clip(self):
        b = jnp.array([[-5.0, -5, 700, 500]])
        out = np.asarray(B.clip_boxes(b, jnp.array([640.0, 480.0])))
        np.testing.assert_allclose(out, [[0, 0, 640, 480]])

    def test_smooth_l1(self):
        p = jnp.array([0.0, 2.0])
        t = jnp.array([0.05, 0.0])
        np.testing.assert_allclose(np.asarray(B.smooth_l1(p, t, beta=0.1)),
                                   [0.5 * 0.05 ** 2 / 0.1, 2.0 - 0.05], atol=1e-6)
