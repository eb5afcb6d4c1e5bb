"""Pallas ROIAlign vs the XLA gather formulation (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weakcube_tpu.ops import roi_align as ra


def _xla_single(features, boxes, strides, out_size=7):
    batched = [f[None] for f in features]
    return ra.multilevel_roi_align(batched, boxes[None], strides, out_size)[0]


class TestPallasROIAlign:
    @pytest.fixture()
    def data(self):
        rng = np.random.default_rng(0)
        strides = (4, 8, 16, 32, 64)
        feats = [jnp.asarray(rng.normal(size=(256 // s, 256 // s, 8))
                             .astype(np.float32)) for s in strides]
        # RoIs of assorted scales, within bounds
        xy = rng.uniform(8, 150, (16, 2))
        wh = rng.uniform(16, 100, (16, 2))
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
        return feats, boxes, strides

    def test_matches_xla_gather(self, data, monkeypatch):
        feats, boxes, strides = data
        from weakcube_tpu.ops import roi_align_pallas as rap
        # interpret mode so the kernel runs on CPU in tests
        orig = rap.pl.pallas_call
        monkeypatch.setattr(rap.pl, "pallas_call",
                            lambda *a, **k: orig(*a, interpret=True, **k))
        got = rap.roi_align_pallas_single(feats, boxes, strides)
        want = _xla_single(feats, boxes, strides)
        # the kernel stages window tiles in bf16 (halves the dominant DMA
        # cost); tolerance reflects bf16 mantissa on ~N(0,1) features
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2, rtol=2e-2)


class TestTrainablePallasROIAlign:
    """fwd_plan='pallas' inside multilevel_roi_align_trainable — the production
    train combo (windowed-DMA forward, scatter-free matmul backward)."""

    @pytest.mark.parametrize("level_skip", [False, True])
    def test_fwd_plan_pallas_matmul_bwd(self, monkeypatch, level_skip):
        """fwd_plan='pallas' in multilevel_roi_align_trainable (the
        candidate train combo: windowed-DMA forward + scatter-free matmul
        backward) — forward close to the gather formulation (bf16 tile
        staging tolerance), backward exactly the matmul plan. Covers both
        level_skip settings: with skip the backward level-sorts the RoIs
        and cond-skips empty (chunk, level) pairs, which must not change
        the gradient at all."""
        rng = np.random.default_rng(11)
        strides = (4, 8, 16, 32, 64)
        feats = tuple(jnp.asarray(rng.normal(size=(2, 128 // s, 128 // s, 8))
                                  .astype(np.float32)) for s in strides)
        xy = rng.uniform(8, 60, (2, 6, 2))
        wh = rng.uniform(10, 50, (2, 6, 2))
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(2, 6, 7, 7, 8)).astype(np.float32))

        from weakcube_tpu.ops import roi_align_pallas as rap
        orig = rap.pl.pallas_call
        monkeypatch.setattr(rap.pl, "pallas_call",
                            lambda *a, **k: orig(*a, interpret=True, **k))

        def loss(fs, fwd_plan):
            out = ra.multilevel_roi_align_trainable(
                fs, boxes, strides, 7, 2, 2, "matmul", fwd_plan, 128,
                level_skip)
            return jnp.sum(out * cot), out

        (_, out_p), g_p = jax.value_and_grad(loss, has_aux=True)(
            feats, "pallas")
        (_, out_g), g_g = jax.value_and_grad(loss, has_aux=True)(
            feats, "gather")
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_g),
                                   atol=2e-2, rtol=2e-2)
        for a, b in zip(g_p, g_g):   # same matmul bwd plan on both sides
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)

class TestAutoWindow:
    def test_window_selection(self):
        from weakcube_tpu.ops.roi_align_pallas import _auto_window
        # 512px image, strides 4..64 -> coarsest 8x8 -> 32
        assert _auto_window([(128, 128), (8, 8)]) == 32
        # KITTI-ish 1664px wide at stride 32 coarsest -> 52 units -> 64
        assert _auto_window([(128, 416), (16, 52)]) == 64
        assert _auto_window([(40, 100)]) == 128

    def test_window64_matches_xla(self, monkeypatch):
        """KITTI-scale wide input (512 x 1664) exercises the 64-unit window:
        the coarsest pooled level is (16, 52), so whole-image RoIs (clamped
        to that level by the area heuristic) span 52 > 32 feature units."""
        rng = np.random.default_rng(5)
        strides = (4, 8, 16, 32)
        H, W = 512, 1664
        feats = [jnp.asarray(rng.normal(size=(H // s, W // s, 8))
                             .astype(np.float32)) for s in strides]
        xy = rng.uniform(4, 600, (12, 2))
        wh = rng.uniform(30, 500, (12, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        boxes[0] = [2.0, 2.0, 1650.0, 500.0]  # whole image -> top level
        boxes = jnp.asarray(boxes)

        from weakcube_tpu.ops import roi_align_pallas as rap
        assert rap._auto_window([f.shape[:2] for f in feats]) == 64
        orig = rap.pl.pallas_call
        monkeypatch.setattr(rap.pl, "pallas_call",
                            lambda *a, **k: orig(*a, interpret=True, **k))
        got = rap.roi_align_pallas_single(feats, boxes, strides)
        want = _xla_single(feats, boxes, strides)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2, rtol=2e-2)
