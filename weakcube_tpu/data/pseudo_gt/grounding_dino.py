"""GroundingDINO in flax — text-prompted box generation for the ground-
segmentation pseudo-GT pass.

The reference drives the (not-vendored) GroundingDINO submodule via
`groundingdino.util.inference.predict(image, "ground", box_thresh=0.35,
text_thresh=0.25)` (generate_ground_segmentations.py:34-37, 137-164).
Architecture implemented here TPU-natively:

  * Swin-T vision trunk (swin.py) -> 3 scales + an extra stride-64 conv;
  * BERT-base text encoder (full-attention transformer over wordpieces);
  * feature enhancer: 6 layers of image deformable self-attention + text
    self-attention + GLIP-style bi-directional cross-attention fusion;
  * deformable attention as an XLA gather/bilinear formulation (the CUDA
    `MultiScaleDeformableAttention` op re-expressed as dense ops,
    SURVEY §2.3 plan);
  * language-guided query selection (top-K proposals by max text logit);
  * 6-layer cross-modality decoder with iterative box refinement;
  * contrastive (dot-product) classification against text features.

Offline-batch oriented: everything static shape, batched over images.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .swin import SwinT

D_MODEL = 256
N_HEADS = 8
N_LEVELS = 4
N_POINTS = 4
N_QUERIES = 900
MAX_TEXT = 64


# ---------------------------------------------------------------------------
# text encoder (BERT-base architecture)
# ---------------------------------------------------------------------------

class BertLayer(nn.Module):
    dim: int = 768
    heads: int = 12
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask):
        dh = self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(x)

        def split(t):
            return t.reshape(*t.shape[:-1], self.heads, dh).swapaxes(-3, -2)
        a = jnp.einsum("bhqd,bhkd->bhqk", split(q) * dh ** -0.5, split(k),
                       preferred_element_type=jnp.float32)
        a = jnp.where(mask[:, None, None, :], a, -1e9)
        a = jax.nn.softmax(a, -1).astype(self.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, split(v))
        o = o.swapaxes(-3, -2).reshape(x.shape)
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(
            x + nn.Dense(self.dim, dtype=self.dtype, name="attn_out")(o))
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="ffn1")(x)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(nn.gelu(h))
        return nn.LayerNorm(dtype=self.dtype, name="ln2")(x + h)


class BertEncoder(nn.Module):
    vocab: int = 30522
    dim: int = 768
    layers: int = 12
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, token_ids, mask):
        emb = nn.Embed(self.vocab, self.dim, dtype=self.dtype, name="tok")(token_ids)
        pos = self.param("pos", nn.initializers.normal(0.02), (1, MAX_TEXT, self.dim))
        x = nn.LayerNorm(dtype=self.dtype, name="emb_ln")(
            emb + pos[:, :token_ids.shape[1]])
        for i in range(self.layers):
            x = BertLayer(self.dim, dtype=self.dtype, name=f"layer{i}")(x, mask)
        return x


# ---------------------------------------------------------------------------
# multi-scale deformable attention (XLA gather formulation)
# ---------------------------------------------------------------------------

def ms_deform_attn(value, value_shapes, sampling_locs, attn_weights):
    """value: (B, sumHW, H_heads, Dh); value_shapes: [(h, w)] static;
    sampling_locs: (B, Q, heads, levels, points, 2) normalised [0, 1];
    attn_weights: (B, Q, heads, levels*points) softmaxed.
    Returns (B, Q, heads*Dh)."""
    B, _, H, Dh = value.shape
    Q = sampling_locs.shape[1]
    out = 0.0
    offset = 0
    attn = attn_weights.reshape(B, Q, H, N_LEVELS, N_POINTS)
    for li, (h, w) in enumerate(value_shapes):
        v = value[:, offset:offset + h * w].reshape(B, h, w, H, Dh)
        offset += h * w
        loc = sampling_locs[:, :, :, li]           # (B, Q, H, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.clip(jnp.floor(x), 0, w - 1)
        y0 = jnp.clip(jnp.floor(y), 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        fx = jnp.clip(x - x0, 0, 1)
        fy = jnp.clip(y - y0, 0, 1)

        def gather(yy, xx):
            yi = yy.astype(jnp.int32)
            xi = xx.astype(jnp.int32)
            flat = v.reshape(B, h * w, H, Dh)
            idx = yi * w + xi                       # (B, Q, H, P)
            idx_t = idx.transpose(0, 2, 1, 3).reshape(B, H, Q * N_POINTS)
            vt = flat.transpose(0, 2, 1, 3)          # (B, H, hw, Dh)
            g = jnp.take_along_axis(vt, idx_t[..., None], axis=2)
            return g.reshape(B, H, Q, N_POINTS, Dh).transpose(0, 2, 1, 3, 4)

        v00 = gather(y0, x0)
        v01 = gather(y0, x1)
        v10 = gather(y1, x0)
        v11 = gather(y1, x1)
        fx = fx[..., None]
        fy = fy[..., None]
        samp = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy) +
                v10 * (1 - fx) * fy + v11 * fx * fy)   # (B, Q, H, P, Dh)
        out = out + jnp.sum(samp * attn[:, :, :, li, :, None], axis=3)
    return out.reshape(B, Q, H * Dh)


class MSDeformAttn(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, query, ref_points, value, value_shapes):
        """query: (B, Q, D); ref_points: (B, Q, 2|4) normalised;
        value: (B, sumHW, D)."""
        B, Q, D = query.shape
        Dh = D // N_HEADS
        v = nn.Dense(D, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(B, -1, N_HEADS, Dh)
        off = nn.Dense(N_HEADS * N_LEVELS * N_POINTS * 2, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="offsets")(query)
        off = off.reshape(B, Q, N_HEADS, N_LEVELS, N_POINTS, 2)
        aw = nn.Dense(N_HEADS * N_LEVELS * N_POINTS, dtype=self.dtype,
                      name="attn_weights")(query)
        aw = jax.nn.softmax(aw.reshape(B, Q, N_HEADS, -1), -1)

        if ref_points.shape[-1] == 4:
            ctr = ref_points[..., :2]
            wh = ref_points[..., 2:]
            locs = ctr[:, :, None, None, None] + \
                off / N_POINTS * wh[:, :, None, None, None] * 0.5
        else:
            shapes = jnp.asarray(value_shapes, jnp.float32)  # (L, 2) h, w
            norm = shapes[None, None, None, :, None, ::-1]   # -> (…, 2) w, h
            locs = ref_points[:, :, None, None, None] + off / norm
        sampled = ms_deform_attn(v, value_shapes, locs, aw)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(sampled)


# ---------------------------------------------------------------------------
# fusion / encoder / decoder
# ---------------------------------------------------------------------------

class BiAttentionFusion(nn.Module):
    """GLIP-style bi-directional image<->text cross attention."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, img, txt, txt_mask):
        D = img.shape[-1]
        dh = D // N_HEADS

        def mha(q, k, v, mask, name):
            qp = nn.Dense(D, dtype=self.dtype, name=f"{name}_q")(q)
            kp = nn.Dense(D, dtype=self.dtype, name=f"{name}_k")(k)
            vp = nn.Dense(D, dtype=self.dtype, name=f"{name}_v")(v)

            def split(t):
                return t.reshape(*t.shape[:-1], N_HEADS, dh).swapaxes(-3, -2)
            a = jnp.einsum("bhqd,bhkd->bhqk", split(qp) * dh ** -0.5, split(kp),
                           preferred_element_type=jnp.float32)
            if mask is not None:
                a = jnp.where(mask[:, None, None, :], a, -1e9)
            a = jax.nn.softmax(a, -1).astype(self.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", a, split(vp))
            o = o.swapaxes(-3, -2).reshape(*q.shape[:-1], D)
            return nn.Dense(D, dtype=self.dtype, name=f"{name}_out")(o)

        i2t = mha(img, txt, txt, txt_mask, "i2t")
        t2i = mha(txt, img, img, None, "t2i")
        img = nn.LayerNorm(dtype=self.dtype, name="ln_img")(img + i2t)
        txt = nn.LayerNorm(dtype=self.dtype, name="ln_txt")(txt + t2i)
        return img, txt


class EnhancerLayer(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, img, img_ref, txt, txt_mask, shapes):
        img, txt = BiAttentionFusion(self.dtype, name="fusion")(img, txt, txt_mask)
        h = MSDeformAttn(self.dtype, name="deform")(img, img_ref, img, shapes)
        img = nn.LayerNorm(dtype=self.dtype, name="ln1")(img + h)
        h = nn.Dense(4 * D_MODEL, dtype=self.dtype, name="ffn1")(img)
        h = nn.Dense(D_MODEL, dtype=self.dtype, name="ffn2")(nn.relu(h))
        img = nn.LayerNorm(dtype=self.dtype, name="ln2")(img + h)
        # text self attention
        t = BertLayer(D_MODEL, N_HEADS, self.dtype, name="txt_layer")(txt, txt_mask)
        return img, t


class DecoderLayer(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, q, ref, img, txt, txt_mask, shapes):
        D = q.shape[-1]
        dh = D // N_HEADS

        def mha(qq, kk, vv, mask, name):
            qp = nn.Dense(D, dtype=self.dtype, name=f"{name}_q")(qq)
            kp = nn.Dense(D, dtype=self.dtype, name=f"{name}_k")(kk)
            vp = nn.Dense(D, dtype=self.dtype, name=f"{name}_v")(vv)

            def split(t):
                return t.reshape(*t.shape[:-1], N_HEADS, dh).swapaxes(-3, -2)
            a = jnp.einsum("bhqd,bhkd->bhqk", split(qp) * dh ** -0.5, split(kp),
                           preferred_element_type=jnp.float32)
            if mask is not None:
                a = jnp.where(mask[:, None, None, :], a, -1e9)
            a = jax.nn.softmax(a, -1).astype(self.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", a, split(vp))
            return nn.Dense(D, dtype=self.dtype, name=f"{name}_out")(
                o.swapaxes(-3, -2).reshape(*qq.shape[:-1], D))

        q = nn.LayerNorm(dtype=self.dtype, name="ln_sa")(q + mha(q, q, q, None, "self"))
        q = nn.LayerNorm(dtype=self.dtype, name="ln_txt")(
            q + mha(q, txt, txt, txt_mask, "txt_cross"))
        h = MSDeformAttn(self.dtype, name="deform")(q, ref, img, shapes)
        q = nn.LayerNorm(dtype=self.dtype, name="ln_img")(q + h)
        h = nn.Dense(4 * D_MODEL, dtype=self.dtype, name="ffn1")(q)
        h = nn.Dense(D_MODEL, dtype=self.dtype, name="ffn2")(nn.relu(h))
        return nn.LayerNorm(dtype=self.dtype, name="ln_ffn")(q + h)


def _inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class GroundingDINO(nn.Module):
    """images (B, H, W, 3) + token_ids (B, T) -> (boxes (B, Q, 4) cxcywh
    normalised, logits (B, Q, T) per-token grounding scores)."""

    num_enhancer: int = 6
    num_decoder: int = 6
    num_queries: int = N_QUERIES
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images, token_ids, token_mask):
        # ---- vision ------------------------------------------------------
        feats = SwinT(dtype=self.dtype, name="backbone")(images)
        # project 3 scales to D_MODEL + extra stride-64 level
        srcs = [nn.Conv(D_MODEL, (1, 1), dtype=self.dtype,
                        name=f"input_proj{i}")(f) for i, f in enumerate(feats)]
        srcs.append(nn.Conv(D_MODEL, (3, 3), (2, 2), padding=1,
                            dtype=self.dtype, name="input_proj3")(feats[-1]))
        shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        B = images.shape[0]
        flat = jnp.concatenate([s.reshape(B, -1, D_MODEL) for s in srcs], 1)
        # reference points: normalised grid centres per level
        refs = []
        for (h, w) in shapes:
            gy, gx = jnp.meshgrid((jnp.arange(h) + 0.5) / h,
                                  (jnp.arange(w) + 0.5) / w, indexing="ij")
            refs.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        img_ref = jnp.tile(jnp.concatenate(refs)[None], (B, 1, 1))

        # ---- text --------------------------------------------------------
        txt768 = BertEncoder(dtype=self.dtype, name="bert")(token_ids, token_mask)
        txt = nn.Dense(D_MODEL, dtype=self.dtype, name="text_proj")(txt768)

        # ---- feature enhancer ---------------------------------------------
        img = flat
        for i in range(self.num_enhancer):
            img, txt = EnhancerLayer(self.dtype, name=f"enhancer{i}")(
                img, img_ref, txt, token_mask, shapes)

        # ---- language-guided query selection ------------------------------
        logits_all = jnp.einsum("bnd,btd->bnt", img, txt,
                                preferred_element_type=jnp.float32)
        logits_all = jnp.where(token_mask[:, None, :], logits_all, -1e9)
        score = jnp.max(logits_all, -1)               # (B, sumHW)
        _, top_idx = jax.lax.top_k(score, min(self.num_queries, score.shape[1]))
        q = jnp.take_along_axis(img, top_idx[..., None], 1)
        ref_xy = jnp.take_along_axis(img_ref, top_idx[..., None], 1)
        # initial boxes from a small MLP on selected features
        init_wh = jax.nn.sigmoid(
            nn.Dense(2, dtype=self.dtype, name="init_wh")(q))
        ref = jnp.concatenate([ref_xy, init_wh * 0.2 + 0.05], -1)  # (B, Q, 4)

        # ---- decoder with iterative refinement ----------------------------
        box_mlp_layers = []
        for i in range(self.num_decoder):
            q = DecoderLayer(self.dtype, name=f"decoder{i}")(
                q, ref, img, txt, token_mask, shapes)
            d = nn.Dense(D_MODEL, dtype=self.dtype, name=f"box_mlp{i}_1")(q)
            d = nn.Dense(D_MODEL, dtype=self.dtype, name=f"box_mlp{i}_2")(nn.relu(d))
            delta = nn.Dense(4, dtype=self.dtype, name=f"box_mlp{i}_3")(nn.relu(d))
            ref = jax.nn.sigmoid(_inverse_sigmoid(ref) + delta)
            ref = jax.lax.stop_gradient(ref)

        logits = jnp.einsum("bqd,btd->bqt", q, txt,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(token_mask[:, None, :], logits, -1e9)
        return ref, logits


def predict_ground_boxes(model, params, images, token_ids, token_mask,
                         box_threshold: float = 0.35):
    """Reference predict() semantics for the 'ground' prompt: max-sigmoid
    logit over tokens, boxes above threshold; returns (boxes cxcywh, scores)."""
    boxes, logits = model.apply({"params": params}, images, token_ids,
                                token_mask)
    scores = jax.nn.sigmoid(jnp.max(logits, -1))
    return boxes, scores
