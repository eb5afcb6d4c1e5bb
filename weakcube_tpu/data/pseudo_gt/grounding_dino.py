"""GroundingDINO (Swin-T "OGC") in flax — text-prompted box generation for
the ground-segmentation pseudo-GT pass.

The reference drives the (not-vendored) GroundingDINO submodule via
`groundingdino.util.inference.predict(image, "ground", box_thresh=0.35,
text_thresh=0.25)` (generate_ground_segmentations.py:34-37, 137-164).
This module implements the released `groundingdino_swint_ogc` architecture
faithfully so the official checkpoint converts onto it
(utils/gdino_convert.py), re-expressed TPU-natively:

  * Swin-T vision trunk (swin.py) -> strides 8/16/32 + extra stride-64
    conv, each projected by 1x1 conv + GroupNorm(32);
  * BERT-base text encoder; HF `bert-base-uncased` weights convert with
    the single-segment token-type embedding folded into the word table;
  * sine HW position embedding (temperature 20, normalised) + a learned
    per-level embedding on the flattened pyramid;
  * feature enhancer: 6 x [GLIP bi-directional fusion (shared QK^T used
    for both softmax directions, per-channel gamma residual scaling),
    text self-attention (4 heads, relu FFN), image deformable
    self-attention (8 heads, 4 levels, 4 points)];
  * deformable attention as an XLA gather/bilinear formulation (the CUDA
    `MultiScaleDeformableAttention` op re-expressed as dense ops,
    SURVEY §2.3 plan);
  * two-stage query selection: proposal grid (wh = 0.05 * 2^lvl) +
    `enc_output` projection, contrastive top-K against the text, boxes
    from `enc_out_bbox_embed`, learned target embeddings (900 x 256);
  * 6-layer decoder: self-attn -> text cross-attn -> deformable
    cross-attn -> FFN, query position from `ref_point_head` over the
    sine embedding of the (x, y, w, h) reference, iterative refinement
    through a shared `bbox_embed` MLP;
  * contrastive (dot-product) classification against text features.

Known deviations (documented, deliberate): dropout/droppath are identity
(inference-only module); the per-phrase text self-attention mask is the
padding mask (exact for single-phrase prompts such as "ground"); static
MAX_TEXT=64 instead of 256 (prompts here are ~5 tokens).

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
FFN_DIM = 2048          # encoder/decoder FFN
TEXT_HEADS = 4          # text-enhancer heads (official: nhead // 2)
TEXT_FFN = 1024         # text-enhancer FFN (official: dim_feedforward // 2)
FUSION_DIM = 1024       # BiMultiHeadAttention embed dim
FUSION_HEADS = 4


# ---------------------------------------------------------------------------
# text encoder (BERT-base architecture, HF naming-compatible structure)
# ---------------------------------------------------------------------------

class BertLayer(nn.Module):
    dim: int = 768
    heads: int = 12
    ffn_dim: Optional[int] = None
    activation: str = "gelu"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask, pos=None):
        """mask: (B, T) padding mask or (B, T, T) full attention mask
        (True = may attend), e.g. the per-phrase mask from
        build_text_masks."""
        dh = self.dim // self.heads
        qk_in = x if pos is None else x + pos
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(qk_in)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(qk_in)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(x)

        def split(t):
            return t.reshape(*t.shape[:-1], self.heads, dh).swapaxes(-3, -2)
        a = jnp.einsum("bhqd,bhkd->bhqk", split(q) * dh ** -0.5, split(k),
                       preferred_element_type=jnp.float32)
        m = mask[:, None, None, :] if mask.ndim == 2 else mask[:, None]
        a = jnp.where(m, a, -1e9)
        a = jax.nn.softmax(a, -1).astype(self.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, split(v))
        o = o.swapaxes(-3, -2).reshape(x.shape)
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(
            x + nn.Dense(self.dim, dtype=self.dtype, name="attn_out")(o))
        ffn = self.ffn_dim or 4 * self.dim
        h = nn.Dense(ffn, dtype=self.dtype, name="ffn1")(x)
        # exact (erf) gelu: HF BERT parity
        h = (nn.gelu(h, approximate=False) if self.activation == "gelu"
             else nn.relu(h))
        h = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(h)
        return nn.LayerNorm(dtype=self.dtype, name="ln2")(x + h)


class BertEncoder(nn.Module):
    vocab: int = 30522
    dim: int = 768
    layers: int = 12
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, token_ids, mask, position_ids=None):
        """mask: (B, T) or (B, T, T); position_ids: (B, T) int (GroundingDINO
        resets positions per phrase — see build_text_masks)."""
        emb = nn.Embed(self.vocab, self.dim, dtype=self.dtype, name="tok")(token_ids)
        pos = self.param("pos", nn.initializers.normal(0.02), (1, MAX_TEXT, self.dim))
        if position_ids is None:
            p = pos[:, :token_ids.shape[1]]
        else:
            p = pos[0][position_ids]
        x = nn.LayerNorm(dtype=self.dtype, name="emb_ln")(emb + p)
        for i in range(self.layers):
            x = BertLayer(self.dim, dtype=self.dtype, name=f"layer{i}")(x, mask)
        return x


def build_text_masks(token_ids: np.ndarray,
                     special_ids=(101, 102, 1012, 1029)):
    """Official generate_masks_with_special_tokens_and_transfer_map, host
    side: tokens between consecutive special tokens ([CLS]/[SEP]/./?) attend
    within their phrase (specials attend only to themselves), and position
    ids restart at each phrase. Returns (attn_mask (B,T,T) bool,
    position_ids (B,T) int32, token_mask (B,T) bool)."""
    token_ids = np.asarray(token_ids)
    B, T = token_ids.shape
    special = np.isin(token_ids, np.asarray(special_ids))
    attn = np.tile(np.eye(T, dtype=bool)[None], (B, 1, 1))
    pos_ids = np.zeros((B, T), np.int64)
    for b in range(B):
        prev = 0
        for col in np.nonzero(special[b])[0]:
            if col not in (0, T - 1):
                attn[b, prev + 1:col + 1, prev + 1:col + 1] = True
                pos_ids[b, prev + 1:col + 1] = np.arange(col - prev)
            prev = int(col)
    return attn, pos_ids.astype(np.int32), token_ids != 0


# ---------------------------------------------------------------------------
# position embeddings
# ---------------------------------------------------------------------------

def sine_pos_embed_hw(h: int, w: int, dim: int = D_MODEL,
                      temperature: float = 20.0) -> np.ndarray:
    """PositionEmbeddingSineHW (normalised, scale 2*pi, temp 20): (h*w, dim),
    y-features first then x — matches the official layout."""
    scale = 2 * math.pi
    eps = 1e-6
    half = dim // 2
    y = (np.arange(1, h + 1, dtype=np.float32)[:, None] / (h + eps) * scale)
    x = (np.arange(1, w + 1, dtype=np.float32)[None, :] / (w + eps) * scale)
    y = np.broadcast_to(y, (h, w))
    x = np.broadcast_to(x, (h, w))
    dim_t = temperature ** (2 * (np.arange(half, dtype=np.float32) // 2) / half)
    py = y[..., None] / dim_t
    px = x[..., None] / dim_t
    def interleave(p):
        return np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])],
                        axis=-1).reshape(h, w, half)
    return np.concatenate([interleave(py), interleave(px)],
                          -1).reshape(h * w, dim)


def sine_embed_1d(coords: jnp.ndarray, dim: int = 128,
                  temperature: float = 10000.0) -> jnp.ndarray:
    """gen_sineembed_position for one coordinate channel: (...,) -> (..., dim).
    coords are normalised [0, 1]; scaled by 2*pi."""
    scale = 2 * math.pi
    dim_t = temperature ** (2 * (jnp.arange(dim, dtype=jnp.float32) // 2) / dim)
    p = coords[..., None].astype(jnp.float32) * scale / dim_t
    return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                     -1).reshape(*coords.shape, dim)


def box_sine_embed(ref: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) cxcywh -> (..., 512) [y, x, w, h] sine embedding (official
    gen_sineembed_position ordering: pos = cat[y_embed, x_embed, w, h])."""
    return jnp.concatenate([sine_embed_1d(ref[..., 1]),
                            sine_embed_1d(ref[..., 0]),
                            sine_embed_1d(ref[..., 2]),
                            sine_embed_1d(ref[..., 3])], -1)


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
        """query: (B, Q, D) (with positional embedding already added);
        ref_points: (B, Q, 2|4) normalised; value: (B, sumHW, D)."""
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
    """GLIP BiAttentionBlock / BiMultiHeadAttention: pre-LN inputs, ONE
    shared QK^T logit matrix softmaxed along each modality, per-channel
    gamma-scaled residuals. Matches the official parameterisation
    (v_proj/l_proj/values_{v,l}_proj/out_{v,l}_proj + gamma_{v,l})."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, img, txt, txt_mask):
        D = img.shape[-1]
        dh = FUSION_DIM // FUSION_HEADS

        vn = nn.LayerNorm(dtype=self.dtype, name="ln_v")(img)
        ln = nn.LayerNorm(dtype=self.dtype, name="ln_l")(txt)
        q = nn.Dense(FUSION_DIM, dtype=self.dtype, name="v_proj")(vn) * dh ** -0.5
        k = nn.Dense(FUSION_DIM, dtype=self.dtype, name="l_proj")(ln)
        vv = nn.Dense(FUSION_DIM, dtype=self.dtype, name="values_v_proj")(vn)
        vl = nn.Dense(FUSION_DIM, dtype=self.dtype, name="values_l_proj")(ln)

        def split(t):
            return t.reshape(*t.shape[:-1], FUSION_HEADS, dh).swapaxes(-3, -2)
        # (B, H, img, txt) shared logits, clamped as the official impl does
        a = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                       preferred_element_type=jnp.float32)
        a = jnp.clip(a, -50000.0, 50000.0)

        # image -> text attention (softmax over text, padding masked)
        a_v = jnp.where(txt_mask[:, None, None, :], a, -1e9)
        a_v = jax.nn.softmax(a_v, -1).astype(self.dtype)
        o_v = jnp.einsum("bhqk,bhkd->bhqd", a_v, split(vl))
        o_v = o_v.swapaxes(-3, -2).reshape(*img.shape[:-1], FUSION_DIM)
        o_v = nn.Dense(D, dtype=self.dtype, name="out_v_proj")(o_v)

        # text -> image attention (softmax over image positions); official
        # stabilises the transposed logits with a per-text-token max
        # subtraction before re-clamping
        a_t = a.swapaxes(-2, -1)                         # (B, H, txt, img)
        a_t = a_t - jnp.max(a_t, axis=-1, keepdims=True)
        a_l = jax.nn.softmax(jnp.clip(a_t, -50000.0, 50000.0),
                             -1).astype(self.dtype)
        o_l = jnp.einsum("bhkq,bhqd->bhkd", a_l, split(vv))
        o_l = o_l.swapaxes(-3, -2).reshape(*txt.shape[:-1], FUSION_DIM)
        o_l = nn.Dense(D, dtype=self.dtype, name="out_l_proj")(o_l)

        gamma_v = self.param("gamma_v", nn.initializers.constant(0.125), (D,))
        gamma_l = self.param("gamma_l", nn.initializers.constant(0.125), (D,))
        return img + gamma_v * o_v, txt + gamma_l * o_l


class EnhancerLayer(nn.Module):
    """One feature-enhancer step: fusion -> text self-attn -> image
    deformable self-attn + FFN (post-norm, relu — official encoder layer)."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, img, img_pos, img_ref, txt, txt_pos, txt_mask,
                 txt_self_mask, shapes):
        img, txt = BiAttentionFusion(self.dtype, name="fusion")(img, txt, txt_mask)
        txt = BertLayer(D_MODEL, TEXT_HEADS, TEXT_FFN, "relu", self.dtype,
                        name="txt_layer")(txt, txt_self_mask, pos=txt_pos)
        h = MSDeformAttn(self.dtype, name="deform")(img + img_pos, img_ref,
                                                    img, shapes)
        img = nn.LayerNorm(dtype=self.dtype, name="ln1")(img + h)
        h = nn.Dense(FFN_DIM, dtype=self.dtype, name="ffn1")(img)
        h = nn.Dense(D_MODEL, dtype=self.dtype, name="ffn2")(nn.relu(h))
        img = nn.LayerNorm(dtype=self.dtype, name="ln2")(img + h)
        return img, txt


class DecoderLayer(nn.Module):
    """Official DeformableTransformerDecoderLayer order: self-attn (q,k
    carry the ref-point positional embedding) -> text cross-attn ->
    deformable cross-attn -> FFN; post-norms norm2/catext_norm/norm1/norm3."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, q, q_pos, ref, img, img_shapes, txt, txt_mask):
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

        q = nn.LayerNorm(dtype=self.dtype, name="ln_sa")(
            q + mha(q + q_pos, q + q_pos, q, None, "self"))
        q = nn.LayerNorm(dtype=self.dtype, name="ln_txt")(
            q + mha(q + q_pos, txt, txt, txt_mask, "txt_cross"))
        h = MSDeformAttn(self.dtype, name="deform")(q + q_pos, ref, img,
                                                    img_shapes)
        q = nn.LayerNorm(dtype=self.dtype, name="ln_img")(q + h)
        h = nn.Dense(FFN_DIM, dtype=self.dtype, name="ffn1")(q)
        h = nn.Dense(D_MODEL, dtype=self.dtype, name="ffn2")(nn.relu(h))
        return nn.LayerNorm(dtype=self.dtype, name="ln_ffn")(q + h)


class MLP(nn.Module):
    dims: Tuple[int, ...]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, dtype=self.dtype, name=f"l{i}")(x)
            if i < len(self.dims) - 1:
                x = nn.relu(x)
        return x


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
    def __call__(self, images, token_ids, token_mask, text_attn_mask=None,
                 position_ids=None):
        """text_attn_mask (B, T, T) / position_ids (B, T): the per-phrase
        attention mask and restarting position ids from build_text_masks;
        fall back to the padding mask / absolute positions."""
        # ---- vision ------------------------------------------------------
        feats = SwinT(dtype=self.dtype, name="backbone")(images)
        # project 3 scales to D_MODEL (+ extra stride-64 level), GroupNorm(32)
        srcs = []
        for i, f in enumerate(feats):
            s = nn.Conv(D_MODEL, (1, 1), dtype=self.dtype,
                        name=f"input_proj{i}")(f)
            srcs.append(nn.GroupNorm(32, dtype=self.dtype,
                                     name=f"input_gn{i}")(s))
        s = nn.Conv(D_MODEL, (3, 3), (2, 2), padding=1, dtype=self.dtype,
                    name="input_proj3")(feats[-1])
        srcs.append(nn.GroupNorm(32, dtype=self.dtype, name="input_gn3")(s))
        shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        B = images.shape[0]
        flat = jnp.concatenate([s.reshape(B, -1, D_MODEL) for s in srcs], 1)

        # sine HW position embedding + learned level embedding
        level_embed = self.param("level_embed",
                                 nn.initializers.normal(1.0),
                                 (N_LEVELS, D_MODEL))
        pos = jnp.concatenate(
            [jnp.asarray(sine_pos_embed_hw(h, w), self.dtype) + level_embed[li]
             for li, (h, w) in enumerate(shapes)], 0)[None]   # (1, sumHW, D)

        # reference points: normalised grid centres per level
        refs = []
        for (h, w) in shapes:
            gy, gx = jnp.meshgrid((jnp.arange(h) + 0.5) / h,
                                  (jnp.arange(w) + 0.5) / w, indexing="ij")
            refs.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        img_ref = jnp.tile(jnp.concatenate(refs)[None], (B, 1, 1))

        # ---- text --------------------------------------------------------
        self_mask = text_attn_mask if text_attn_mask is not None else token_mask
        txt768 = BertEncoder(dtype=self.dtype, name="bert")(
            token_ids, self_mask, position_ids)
        txt = nn.Dense(D_MODEL, dtype=self.dtype, name="text_proj")(txt768)
        # get_sine_pos_embed of the per-phrase restarting position ids when
        # provided (the official TransformerEncoder always receives them via
        # generate_masks_with_special_tokens_and_transfer_map); raw token
        # index only as the no-position_ids fallback.
        if position_ids is not None:
            txt_pos = sine_embed_1d(position_ids.astype(jnp.float32),
                                    D_MODEL).astype(self.dtype)
        else:
            txt_pos = sine_embed_1d(
                jnp.arange(token_ids.shape[1], dtype=jnp.float32),
                D_MODEL)[None].astype(self.dtype)

        # ---- feature enhancer ---------------------------------------------
        img = flat
        for i in range(self.num_enhancer):
            img, txt = EnhancerLayer(self.dtype, name=f"enhancer{i}")(
                img, pos, img_ref, txt, txt_pos, token_mask, self_mask,
                shapes)

        # ---- two-stage query selection ------------------------------------
        # proposal grid: centres with wh = 0.05 * 2^lvl, in logit space;
        # near-border proposals are invalid (official
        # gen_encoder_output_proposals)
        whs = jnp.concatenate(
            [jnp.full((h * w, 2), 0.05 * 2.0 ** li, jnp.float32)
             for li, (h, w) in enumerate(shapes)], 0)
        proposals = jnp.concatenate(
            [img_ref, jnp.tile(whs[None], (B, 1, 1))], -1)     # (B, sumHW, 4)
        valid = jnp.all((proposals > 0.01) & (proposals < 0.99), -1)
        prop_logit = jnp.where(valid[..., None], _inverse_sigmoid(proposals),
                               jnp.inf)
        mem = jnp.where(valid[..., None], img, 0.0)
        mem = nn.Dense(D_MODEL, dtype=self.dtype, name="enc_output")(mem)
        mem = nn.LayerNorm(dtype=self.dtype, name="enc_output_norm")(mem)

        logits_all = jnp.einsum("bnd,btd->bnt", mem, txt,
                                preferred_element_type=jnp.float32)
        logits_all = jnp.where(token_mask[:, None, :], logits_all, -jnp.inf)
        score = jnp.max(logits_all, -1)               # (B, sumHW)
        score = jnp.where(valid, score, -jnp.inf)
        _, top_idx = jax.lax.top_k(score, min(self.num_queries, score.shape[1]))

        coord_logit = MLP((D_MODEL, D_MODEL, 4), self.dtype,
                          name="enc_out_bbox_embed")(mem) + prop_logit
        ref = jax.nn.sigmoid(jnp.take_along_axis(
            coord_logit, top_idx[..., None], 1))               # (B, Q, 4)
        ref = jax.lax.stop_gradient(ref)

        # learned target embeddings (embed_init_tgt=True in the OGC config)
        tgt_embed = self.param("tgt_embed", nn.initializers.normal(1.0),
                               (self.num_queries, D_MODEL))
        q = jnp.tile(tgt_embed[None].astype(self.dtype),
                     (B, 1, 1))[:, :top_idx.shape[1]]

        # ---- decoder with iterative refinement ----------------------------
        # bbox_embed is SHARED across layers (dec_pred_bbox_embed_share)
        bbox_embed = MLP((D_MODEL, D_MODEL, 4), self.dtype, name="bbox_embed")
        ref_point_head = MLP((D_MODEL, D_MODEL), self.dtype,
                             name="ref_point_head")
        final_norm = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")

        normed = q
        for i in range(self.num_decoder):
            q_pos = ref_point_head(box_sine_embed(ref).astype(self.dtype))
            q = DecoderLayer(self.dtype, name=f"decoder{i}")(
                q, q_pos, ref, img, shapes, txt, token_mask)
            # internal refinement uses the raw output; the reported boxes
            # per layer use the normed output (official decoder semantics)
            delta = bbox_embed(q)
            normed = final_norm(q)
            if i < self.num_decoder - 1:
                ref = jax.lax.stop_gradient(
                    jax.nn.sigmoid(delta + _inverse_sigmoid(ref)))

        boxes = jax.nn.sigmoid(bbox_embed(normed) + _inverse_sigmoid(ref))
        logits = jnp.einsum("bqd,btd->bqt", normed, txt,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(token_mask[:, None, :], logits, -jnp.inf)
        return boxes, logits


# ---------------------------------------------------------------------------
# official-checkpoint converter (groundingdino_swint_ogc.pth)
# ---------------------------------------------------------------------------

def _t(w):
    return np.asarray(w).T


def _dense(sd, name):
    return {"kernel": _t(sd[name + ".weight"]), "bias": np.asarray(sd[name + ".bias"])}


def _conv(sd, name):
    out = {"kernel": np.transpose(np.asarray(sd[name + ".weight"]), (2, 3, 1, 0))}
    if name + ".bias" in sd:
        out["bias"] = np.asarray(sd[name + ".bias"])
    return out


def _norm(sd, name):
    return {"scale": np.asarray(sd[name + ".weight"]),
            "bias": np.asarray(sd[name + ".bias"])}


def _mha(sd, name):
    """torch nn.MultiheadAttention -> our {prefix}_{q,k,v,out} Denses."""
    w = np.asarray(sd[name + ".in_proj_weight"])
    b = np.asarray(sd[name + ".in_proj_bias"])
    D = w.shape[0] // 3
    return {
        "q": {"kernel": w[:D].T, "bias": b[:D]},
        "k": {"kernel": w[D:2 * D].T, "bias": b[D:2 * D]},
        "v": {"kernel": w[2 * D:].T, "bias": b[2 * D:]},
        "out": _dense(sd, name + ".out_proj"),
    }


def _deform(sd, name):
    return {"value_proj": _dense(sd, name + ".value_proj"),
            "offsets": _dense(sd, name + ".sampling_offsets"),
            "attn_weights": _dense(sd, name + ".attention_weights"),
            "out_proj": _dense(sd, name + ".output_proj")}


def _mlp(sd, name, n):
    return {f"l{i}": _dense(sd, f"{name}.layers.{i}") for i in range(n)}


def _bert_like_layer(sd, q, k, v, out, ln1, ffn1, ffn2, ln2):
    return {"q": q, "k": k, "v": v, "attn_out": out, "ln1": ln1,
            "ffn1": ffn1, "ffn2": ffn2, "ln2": ln2}


def _convert_swin(sd, prefix="backbone.0."):
    """Official Swin-T naming -> our SwinT tree. The patch-merging concat
    order differs (official [h0w0, h1w0, h0w1, h1w1]; ours
    [h0w0, h0w1, h1w0, h1w1]) so the 4C input blocks are permuted."""
    p: Dict = {}
    p["patch_embed"] = _conv(sd, prefix + "patch_embed.proj")
    p["patch_norm"] = _norm(sd, prefix + "patch_embed.norm")
    depths = (2, 2, 6, 2)
    for si, depth in enumerate(depths):
        for bi in range(depth):
            b = f"{prefix}layers.{si}.blocks.{bi}."
            p[f"stage{si}_block{bi}"] = {
                "norm1": _norm(sd, b + "norm1"),
                "norm2": _norm(sd, b + "norm2"),
                "attn": {
                    "qkv": _dense(sd, b + "attn.qkv"),
                    "proj": _dense(sd, b + "attn.proj"),
                    "rel_bias_table": np.asarray(
                        sd[b + "attn.relative_position_bias_table"]),
                },
                "mlp_fc1": _dense(sd, b + "mlp.fc1"),
                "mlp_fc2": _dense(sd, b + "mlp.fc2"),
            }
        if si < len(depths) - 1:
            C = 96 * 2 ** si
            perm = np.concatenate([np.arange(C),            # h0 w0
                                   2 * C + np.arange(C),    # h0 w1 <- off. x2
                                   C + np.arange(C),        # h1 w0 <- off. x1
                                   3 * C + np.arange(C)])   # h1 w1
            red = _t(sd[f"{prefix}layers.{si}.downsample.reduction.weight"])
            nrm = _norm(sd, f"{prefix}layers.{si}.downsample.norm")
            p[f"merge_reduce{si}"] = {"kernel": red[perm]}
            p[f"merge_norm{si}"] = {"scale": nrm["scale"][perm],
                                    "bias": nrm["bias"][perm]}
    for si in (1, 2, 3):
        p[f"out_norm{si}"] = _norm(sd, f"{prefix}norm{si}")
    return p


def _convert_bert(sd, prefix="bert.", max_text: int = MAX_TEXT):
    """HF bert-base-uncased naming -> our BertEncoder tree. The (single
    segment) token-type embedding is folded into the word table; position
    embeddings are sliced to MAX_TEXT."""
    emb = np.asarray(sd[prefix + "embeddings.word_embeddings.weight"])
    tt = np.asarray(sd[prefix + "embeddings.token_type_embeddings.weight"])[0]
    pos = np.asarray(sd[prefix + "embeddings.position_embeddings.weight"])
    p: Dict = {
        "tok": {"embedding": emb + tt},
        "pos": pos[None, :max_text],
        "emb_ln": _norm(sd, prefix + "embeddings.LayerNorm"),
    }
    for i in range(12):
        b = f"{prefix}encoder.layer.{i}."
        p[f"layer{i}"] = _bert_like_layer(
            sd,
            _dense(sd, b + "attention.self.query"),
            _dense(sd, b + "attention.self.key"),
            _dense(sd, b + "attention.self.value"),
            _dense(sd, b + "attention.output.dense"),
            _norm(sd, b + "attention.output.LayerNorm"),
            _dense(sd, b + "intermediate.dense"),
            _dense(sd, b + "output.dense"),
            _norm(sd, b + "output.LayerNorm"))
    return p


def convert_torch_checkpoint(sd: Dict[str, np.ndarray],
                             num_layers: int = 6) -> Dict:
    """Official groundingdino_swint_ogc state_dict (numpy values; 'module.'
    prefix stripped by the caller or here) -> flax params for GroundingDINO.
    Reference naming: IDEA-Research/GroundingDINO groundingdino/models."""
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in sd.items()}
    p: Dict = {}
    p["backbone"] = _convert_swin(sd)
    p["bert"] = _convert_bert(sd)
    p["text_proj"] = _dense(sd, "feat_map")
    for i in range(4):
        p[f"input_proj{i}"] = _conv(sd, f"input_proj.{i}.0")
        p[f"input_gn{i}"] = _norm(sd, f"input_proj.{i}.1")
    p["level_embed"] = np.asarray(sd["transformer.level_embed"])

    for i in range(num_layers):
        e = f"transformer.encoder.layers.{i}."
        f = f"transformer.encoder.fusion_layers.{i}."
        t = f"transformer.encoder.text_layers.{i}."
        tm = _mha(sd, t + "self_attn")
        p[f"enhancer{i}"] = {
            "fusion": {
                "ln_v": _norm(sd, f + "layer_norm_v"),
                "ln_l": _norm(sd, f + "layer_norm_l"),
                "v_proj": _dense(sd, f + "attn.v_proj"),
                "l_proj": _dense(sd, f + "attn.l_proj"),
                "values_v_proj": _dense(sd, f + "attn.values_v_proj"),
                "values_l_proj": _dense(sd, f + "attn.values_l_proj"),
                "out_v_proj": _dense(sd, f + "attn.out_v_proj"),
                "out_l_proj": _dense(sd, f + "attn.out_l_proj"),
                "gamma_v": np.asarray(sd[f + "gamma_v"]),
                "gamma_l": np.asarray(sd[f + "gamma_l"]),
            },
            "txt_layer": _bert_like_layer(
                sd, tm["q"], tm["k"], tm["v"], tm["out"],
                _norm(sd, t + "norm1"), _dense(sd, t + "linear1"),
                _dense(sd, t + "linear2"), _norm(sd, t + "norm2")),
            "deform": _deform(sd, e + "self_attn"),
            "ln1": _norm(sd, e + "norm1"),
            "ffn1": _dense(sd, e + "linear1"),
            "ffn2": _dense(sd, e + "linear2"),
            "ln2": _norm(sd, e + "norm2"),
        }

    p["enc_output"] = _dense(sd, "transformer.enc_output")
    p["enc_output_norm"] = _norm(sd, "transformer.enc_output_norm")
    p["enc_out_bbox_embed"] = _mlp(sd, "transformer.enc_out_bbox_embed", 3)
    p["tgt_embed"] = np.asarray(sd["transformer.tgt_embed.weight"])
    p["ref_point_head"] = _mlp(sd, "transformer.decoder.ref_point_head", 2)
    p["bbox_embed"] = _mlp(sd, "transformer.decoder.bbox_embed.0", 3)
    p["decoder_norm"] = _norm(sd, "transformer.decoder.norm")

    for i in range(num_layers):
        d = f"transformer.decoder.layers.{i}."
        sa = _mha(sd, d + "self_attn")
        ca = _mha(sd, d + "ca_text")
        p[f"decoder{i}"] = {
            **{f"self_{k}": v for k, v in sa.items()},
            **{f"txt_cross_{k}": v for k, v in ca.items()},
            "deform": _deform(sd, d + "cross_attn"),
            "ln_sa": _norm(sd, d + "norm2"),
            "ln_txt": _norm(sd, d + "catext_norm"),
            "ln_img": _norm(sd, d + "norm1"),
            "ffn1": _dense(sd, d + "linear1"),
            "ffn2": _dense(sd, d + "linear2"),
            "ln_ffn": _norm(sd, d + "norm3"),
        }
    return p


def predict_ground_boxes(model, params, images, token_ids, token_mask,
                         box_threshold: float = 0.35):
    """Reference predict() semantics for the 'ground' prompt: max-sigmoid
    logit over tokens, boxes above threshold; returns (boxes cxcywh, scores)."""
    attn, pos_ids, _ = build_text_masks(np.asarray(token_ids))
    boxes, logits = model.apply({"params": params}, images, token_ids,
                                token_mask, jnp.asarray(attn),
                                jnp.asarray(pos_ids))
    scores = jax.nn.sigmoid(jnp.max(logits, -1))
    return boxes, scores
