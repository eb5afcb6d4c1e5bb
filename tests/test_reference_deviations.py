"""Quantify the three documented deviations from reference semantics so an
M3 accuracy miss is attributable (round-2 VERDICT weak #6 / round-3 item 5).

Each test computes OUR implementation and a faithful numpy re-statement of
the REFERENCE semantics on identical inputs, prints the measured delta, and
asserts it stays inside the bound recorded in PARITY.md. None of these are
parity tests — the deviations are deliberate (static shapes / bug
un-transposition); the point is a pinned, measured magnitude.

Deviations covered:
  1. sampled-lattice median vs exact box median
     (models/roi_heads.py::masked_median_depth_in_boxes vs reference
      roi_heads.py:575-610 torch.median over the integer crop)
  2. fixed sampling_ratio=2 vs adaptive POOLER_SAMPLING_RATIO=0 ROIAlignV2
     (ops/roi_align.py vs detectron2 ROIAlignV2 ceil(bin)-adaptive grid)
  3. segment-loss focal argument order: the reference transposes the
     torchvision signature (sigmoid_focal_loss(y, y_hat) — mask used as
     logits, reference roi_heads.py:442); we keep the intended order.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _smooth_depth(rng, H, W, base=3.0, amp=2.0):
    """Plausible indoor depth map: smooth gradient + low-frequency bumps."""
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    d = (base + amp * (y / H)
         + 0.5 * np.sin(2 * np.pi * x / W * 2.3)
         + 0.3 * np.cos(2 * np.pi * y / H * 1.7))
    d += rng.normal(0, 0.05, (H, W)).astype(np.float32)
    return np.maximum(d, 0.1).astype(np.float32)


class TestMedianDepthDeviation:
    def test_lattice_vs_exact_median(self):
        """Reference: torch.median (LOWER median) of depth[y1:y2, x1:x2]
        (integer-truncated bounds). Ours: median over a fixed 32x32
        bilinear lattice. On smooth depth maps the deviation must stay
        well under the depth noise floor (< 5 cm mean, < 25 cm max over
        boxes >= 8px)."""
        rng = np.random.default_rng(0)
        H = W = 128
        B, S = 4, 24
        depth = np.stack([_smooth_depth(rng, H, W) for _ in range(B)])
        x1 = rng.uniform(0, W - 20, (B, S))
        y1 = rng.uniform(0, H - 20, (B, S))
        bw = rng.uniform(8, 60, (B, S))
        bh = rng.uniform(8, 60, (B, S))
        boxes = np.stack([x1, y1, np.minimum(x1 + bw, W - 1),
                          np.minimum(y1 + bh, H - 1)], -1).astype(np.float32)

        # reference semantics (roi_heads.py:595-597): integer crop, torch
        # lower-median
        ref = np.zeros((B, S), np.float32)
        for b in range(B):
            for s in range(S):
                xx1, yy1, xx2, yy2 = boxes[b, s]
                crop = depth[b, int(yy1):int(yy2), int(xx1):int(xx2)].ravel()
                k = (crop.size - 1) // 2          # torch.median = lower median
                ref[b, s] = np.partition(crop, k)[k]

        from weakcube_tpu.models.roi_heads import masked_median_depth_in_boxes
        ours = np.asarray(masked_median_depth_in_boxes(
            jnp.asarray(depth), jnp.asarray(boxes),
            jnp.asarray([[float(W), float(H)]] * B, dtype=jnp.float32)))

        delta = np.abs(ours - ref)
        print(f"median-depth deviation: mean {delta.mean():.4f} m, "
              f"max {delta.max():.4f} m over {B * S} boxes")
        assert delta.mean() < 0.05, delta.mean()
        assert delta.max() < 0.25, delta.max()


def _roi_align_v2_numpy(feat, boxes, stride, out, sampling_ratio):
    """Faithful detectron2 ROIAlignV2 (aligned=True) on one NHWC level.
    sampling_ratio=0 -> adaptive ceil(bin_size) samples per bin edge."""
    H, W, C = feat.shape
    R = boxes.shape[0]
    res = np.zeros((R, out, out, C), np.float32)

    def bilinear(y, x):
        y = min(max(y, 0.0), H - 1.0)
        x = min(max(x, 0.0), W - 1.0)
        y0, x0 = int(math.floor(y)), int(math.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        ly, lx = y - y0, x - x0
        return ((1 - ly) * (1 - lx) * feat[y0, x0]
                + (1 - ly) * lx * feat[y0, x1]
                + ly * (1 - lx) * feat[y1, x0]
                + ly * lx * feat[y1, x1])

    for r in range(R):
        x1, y1, x2, y2 = boxes[r] / stride
        # aligned=True: half-pixel shift
        x1, y1, x2, y2 = x1 - 0.5, y1 - 0.5, x2 - 0.5, y2 - 0.5
        bw = (x2 - x1) / out
        bh = (y2 - y1) / out
        for i in range(out):
            for j in range(out):
                gy = sampling_ratio if sampling_ratio > 0 else max(
                    int(math.ceil(bh)), 1)
                gx = sampling_ratio if sampling_ratio > 0 else max(
                    int(math.ceil(bw)), 1)
                acc = np.zeros(C, np.float32)
                for iy in range(gy):
                    for ix in range(gx):
                        yy = y1 + i * bh + (iy + 0.5) * bh / gy
                        xx = x1 + j * bw + (ix + 0.5) * bw / gx
                        acc += bilinear(yy, xx)
                res[r, i, j] = acc / (gy * gx)
    return res


class TestSamplingRatioDeviation:
    def test_sr2_vs_adaptive(self):
        """Our fixed sampling_ratio=2 vs the reference's adaptive
        POOLER_SAMPLING_RATIO=0 on the same level-0 features. For RoIs
        around the 7x7-pooler scale the adaptive grid is 1-3 samples/bin;
        the deviation must stay a small fraction of the feature scale."""
        rng = np.random.default_rng(1)
        H = W = 64
        C = 8
        stride = 4
        # smooth-ish features: deviations on white noise would overstate the
        # real effect on conv feature maps
        base = rng.normal(0, 1, (H // 4, W // 4, C)).astype(np.float32)
        feat = np.kron(base, np.ones((4, 4, 1), np.float32))
        feat += rng.normal(0, 0.1, (H, W, C)).astype(np.float32)

        R = 24
        x1 = rng.uniform(0, W * stride - 80, R)
        y1 = rng.uniform(0, H * stride - 80, R)
        sz = rng.uniform(30, 70, (R, 2))     # boxes near canonical 7x7 scale
        boxes = np.stack([x1, y1, x1 + sz[:, 0], y1 + sz[:, 1]], -1).astype(np.float32)

        ref_adaptive = _roi_align_v2_numpy(feat, boxes, stride, 7, 0)
        ref_sr2 = _roi_align_v2_numpy(feat, boxes, stride, 7, 2)

        from weakcube_tpu.ops.roi_align import multilevel_roi_align
        ours = np.asarray(multilevel_roi_align(
            [jnp.asarray(feat[None])], jnp.asarray(boxes[None]),
            strides=(stride,), output_size=7, sampling_ratio=2))[0]

        # sanity: ours == the SR2 reference (same algorithm)
        np.testing.assert_allclose(ours, ref_sr2, atol=2e-4, rtol=1e-3)

        delta = np.abs(ours - ref_adaptive)
        scale = np.abs(feat).mean()
        print(f"SR2-vs-adaptive deviation: mean {delta.mean():.4f}, "
              f"max {delta.max():.4f} (feature scale {scale:.3f}); "
              f"relative mean {delta.mean() / scale:.3%}")
        assert delta.mean() / scale < 0.05, delta.mean() / scale
        assert delta.max() / scale < 1.0, delta.max() / scale


class TestFocalArgumentOrderDeviation:
    def test_focal_orders_on_identical_inputs(self):
        """Reference (roi_heads.py:442): sigmoid_focal_loss(y, y_hat) —
        the BINARY MASK is passed as logits and the soft hull as targets.
        Ours: focal(hull_logits, mask). Both computed here on identical
        inputs; the measured gap is the deviation magnitude (the reference
        order saturates: sigmoid(mask in {0, 1}) in {0.5, 0.73})."""
        rng = np.random.default_rng(2)
        S = 32
        mask = (rng.uniform(size=(S, S)) > 0.6).astype(np.float32)
        hull = np.clip(rng.uniform(-0.2, 1.2, (S, S)), 0, 1).astype(np.float32)
        hull_logits = hull * 8.0 - 4.0     # the mapping segment_loss uses

        from weakcube_tpu.ops.losses import sigmoid_focal_loss
        ours = float(jnp.mean(sigmoid_focal_loss(
            jnp.asarray(hull_logits), jnp.asarray(mask))))
        # reference argument order (mask as logits, hull as target)
        ref_bug = float(jnp.mean(sigmoid_focal_loss(
            jnp.asarray(mask), jnp.asarray(hull))))

        # gradient direction: ours must push the hull toward the mask;
        # the transposed order has NO gradient to the hull logits at all
        # (hull enters only as the target)
        g_ours = jax.grad(lambda h: jnp.mean(sigmoid_focal_loss(
            h, jnp.asarray(mask))))(jnp.asarray(hull_logits))
        g_ref = jax.grad(lambda h: jnp.mean(sigmoid_focal_loss(
            jnp.asarray(mask), h)))(jnp.asarray(hull))

        print(f"focal-order deviation: ours {ours:.4f} vs transposed "
              f"{ref_bug:.4f} (|delta| {abs(ours - ref_bug):.4f}); "
              f"grad-to-hull norm ours {float(jnp.linalg.norm(g_ours)):.4f} "
              f"vs transposed {float(jnp.linalg.norm(g_ref)):.4f}")
        assert ours != pytest.approx(ref_bug, abs=1e-6)
        # the transposed order still backpropagates (hull is the target
        # inside the CE term), but through a much flatter path; record both
        assert float(jnp.linalg.norm(g_ours)) > 0
