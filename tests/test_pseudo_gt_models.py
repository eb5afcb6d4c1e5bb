"""Foundation-model architecture tests (shapes/finiteness on tiny inputs).

Checkpoint-level numerical parity needs the released weights (not available
in this sealed environment); these tests pin the architectural contracts the
converters map onto.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestDepthAnything:
    def test_vits_shapes(self):
        from weakcube_tpu.data.pseudo_gt.depth_anything_v2 import DepthAnythingV2
        model = DepthAnythingV2(variant="vits", max_depth=20.0,
                                dtype=jnp.float32)
        x = jnp.zeros((1, 98, 98, 3))  # 7x7 patches
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        d = model.apply({"params": params}, x)
        assert d.shape == (1, 98, 98)
        dn = np.asarray(d)
        assert np.all(np.isfinite(dn)) and (dn >= 0).all() and (dn <= 20).all()

    def test_converter_roundtrip_keys(self):
        """The converter must produce exactly the parameter tree the model
        expects (structure check against a synthetic torch state_dict)."""
        from weakcube_tpu.data.pseudo_gt.depth_anything_v2 import (
            DepthAnythingV2, VIT_SPECS, convert_torch_checkpoint)
        variant = "vits"
        dim, depth, heads, feat, out_ch = VIT_SPECS[variant]
        rng = np.random.default_rng(0)

        sd = {}
        sd["pretrained.patch_embed.proj.weight"] = rng.normal(size=(dim, 3, 14, 14))
        sd["pretrained.patch_embed.proj.bias"] = rng.normal(size=(dim,))
        sd["pretrained.cls_token"] = rng.normal(size=(1, 1, dim))
        sd["pretrained.pos_embed"] = rng.normal(size=(1, 1 + 7 * 7, dim))
        for i in range(depth):
            p = f"pretrained.blocks.{i}."
            sd[p + "norm1.weight"] = np.ones(dim); sd[p + "norm1.bias"] = np.zeros(dim)
            sd[p + "norm2.weight"] = np.ones(dim); sd[p + "norm2.bias"] = np.zeros(dim)
            sd[p + "attn.qkv.weight"] = rng.normal(size=(3 * dim, dim)) * 0.02
            sd[p + "attn.qkv.bias"] = np.zeros(3 * dim)
            sd[p + "attn.proj.weight"] = rng.normal(size=(dim, dim)) * 0.02
            sd[p + "attn.proj.bias"] = np.zeros(dim)
            sd[p + "mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim)) * 0.02
            sd[p + "mlp.fc1.bias"] = np.zeros(4 * dim)
            sd[p + "mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim)) * 0.02
            sd[p + "mlp.fc2.bias"] = np.zeros(dim)
            sd[p + "ls1.gamma"] = np.ones(dim)
            sd[p + "ls2.gamma"] = np.ones(dim)
        for i in range(4):
            sd[f"depth_head.projects.{i}.weight"] = rng.normal(
                size=(out_ch[i], dim, 1, 1)) * 0.02
            sd[f"depth_head.projects.{i}.bias"] = np.zeros(out_ch[i])
            sd[f"depth_head.scratch.layer{i + 1}_rn.weight"] = rng.normal(
                size=(feat, out_ch[i], 3, 3)) * 0.02
            rn = f"depth_head.scratch.refinenet{i + 1}."
            for unit in ("resConfUnit1", "resConfUnit2"):
                for c in ("conv1", "conv2"):
                    sd[rn + f"{unit}.{c}.weight"] = rng.normal(
                        size=(feat, feat, 3, 3)) * 0.02
                    sd[rn + f"{unit}.{c}.bias"] = np.zeros(feat)
        sd["depth_head.scratch.output_conv1.weight"] = rng.normal(
            size=(feat // 2, feat, 3, 3)) * 0.02
        sd["depth_head.scratch.output_conv1.bias"] = np.zeros(feat // 2)
        sd["depth_head.scratch.output_conv2.0.weight"] = rng.normal(
            size=(32, feat // 2, 3, 3)) * 0.02
        sd["depth_head.scratch.output_conv2.0.bias"] = np.zeros(32)
        sd["depth_head.scratch.output_conv2.2.weight"] = rng.normal(
            size=(1, 32, 1, 1)) * 0.02
        sd["depth_head.scratch.output_conv2.2.bias"] = np.zeros(1)

        params = convert_torch_checkpoint(sd, variant)
        model = DepthAnythingV2(variant=variant, dtype=jnp.float32)
        x = jnp.zeros((1, 98, 98, 3))
        # apply with converted params: any missing/mis-shaped leaf raises
        d = model.apply({"params": params}, x)
        assert d.shape == (1, 98, 98)
        assert np.all(np.isfinite(np.asarray(d)))


class TestSam:
    def test_box_prompted_masks(self):
        from weakcube_tpu.data.pseudo_gt.sam import Sam
        model = Sam(variant="vit_tiny", dtype=jnp.float32)
        x = jnp.zeros((1, 256, 256, 3))
        boxes = jnp.asarray([[[100.0, 100, 600, 600], [0, 0, 1024, 1024]]])
        params = model.init(jax.random.PRNGKey(0), x, boxes)["params"]
        masks = model.apply({"params": params}, x, boxes)
        assert masks.shape == (1, 2, 64, 64)  # 4x the 16-grid
        assert np.all(np.isfinite(np.asarray(masks)))


class TestGroundingDINO:
    def test_tiny_forward(self):
        from weakcube_tpu.data.pseudo_gt.grounding_dino import GroundingDINO
        model = GroundingDINO(num_enhancer=1, num_decoder=2, num_queries=32,
                              dtype=jnp.float32)
        x = jnp.zeros((1, 112, 112, 3))
        tokens = jnp.asarray([[101, 2598, 102] + [0] * 13])  # "ground"
        mask = tokens > 0
        params = model.init(jax.random.PRNGKey(0), x, tokens, mask)["params"]
        boxes, logits = model.apply({"params": params}, x, tokens, mask)
        assert boxes.shape == (1, 32, 4)
        b = np.asarray(boxes)
        assert (b >= 0).all() and (b <= 1).all()  # normalised cxcywh
        assert logits.shape == (1, 32, 16)
        # masked tokens must be -inf-ish
        assert np.asarray(logits)[..., 5:].max() < -1e8


class TestDeformableAttention:
    def test_matches_numpy_bilinear(self):
        """ms_deform_attn vs a direct numpy bilinear-sampling reference."""
        import numpy as np
        from weakcube_tpu.data.pseudo_gt import grounding_dino as gd

        rng = np.random.default_rng(0)
        B, H_heads, Dh, Q = 1, 2, 4, 3
        shapes = [(4, 6), (2, 3), (2, 2), (2, 2)]  # N_LEVELS = 4
        sumHW = sum(h * w for h, w in shapes)
        value = rng.normal(size=(B, sumHW, H_heads, Dh)).astype(np.float32)
        locs = rng.uniform(0.2, 0.8, (B, Q, H_heads, 4, gd.N_POINTS, 2)).astype(np.float32)
        attn = rng.uniform(0, 1, (B, Q, H_heads, 4 * gd.N_POINTS)).astype(np.float32)
        attn /= attn.sum(-1, keepdims=True)

        got = np.asarray(gd.ms_deform_attn(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn)))

        # numpy reference
        def bilinear(img, x, y):  # img (h, w, d)
            h, w = img.shape[:2]
            x = np.clip(x, 0, w - 1); y = np.clip(y, 0, h - 1)
            x0, y0 = int(np.floor(x)), int(np.floor(y))
            x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
            fx, fy = x - x0, y - y0
            return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
                    + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)

        want = np.zeros((B, Q, H_heads, Dh), np.float32)
        a = attn.reshape(B, Q, H_heads, 4, gd.N_POINTS)
        off = 0
        for li, (h, w) in enumerate(shapes):
            img = value[0, off:off + h * w].reshape(h, w, H_heads, Dh)
            off += h * w
            for q in range(Q):
                for hd in range(H_heads):
                    for p in range(gd.N_POINTS):
                        x = locs[0, q, hd, li, p, 0] * w - 0.5
                        y = locs[0, q, hd, li, p, 1] * h - 0.5
                        want[0, q, hd] += a[0, q, hd, li, p] * \
                            bilinear(img[:, :, hd], x, y)
        np.testing.assert_allclose(got.reshape(B, Q, H_heads, Dh), want,
                                   atol=2e-5, rtol=1e-4)
