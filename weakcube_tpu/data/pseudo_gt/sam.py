"""Segment Anything (SAM / SAM-HQ) in flax — box-prompted mask generation.

The reference drives SAM-HQ through `segment_anything.sam_model_registry`
with box prompts, both offline (generate_ground_segmentations.py:5-20,
171-191) and inside the train step for the segmentation/depth losses
(roi_heads.py:383-401 `object_masks`). This is the TPU-native equivalent:

  * image encoder: ViT-det (patch 16, windowed attention with global blocks,
    relative position embeddings) -> (64, 64, 256) embedding;
  * prompt encoder: box corners -> 2 positional tokens (random Fourier
    features + learned corner type embeddings);
  * mask decoder: two-way transformer (token<->image cross attention),
    hypernetwork MLPs over upscaled embeddings;
  * HQ variant: an extra HQ output token + early/final feature fusion
    (convert_torch_checkpoint maps sam_hq_vit_* checkpoints incl. the HQ
    modules).

Batched over (images x boxes); everything static-shape. vit_b by default.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAM_SPECS = {
    # embed_dim, depth, heads, global_attn_indexes
    "vit_b": (768, 12, 12, (2, 5, 8, 11)),
    "vit_l": (1024, 24, 16, (5, 11, 17, 23)),
    "vit_tiny": (192, 12, 3, (2, 5, 8, 11)),
}
IMG_SIZE = 1024
PATCH = 16
EMBED = 256  # prompt/mask transformer dim
WINDOW = 14


def _rel_pos_bias(q_hw, k_hw, rel_h, rel_w, q, dim_head):
    """Decomposed relative position bias (ViT-det attention)."""
    qh, qw = q_hw
    kh, kw = k_hw
    # gather relative embeddings
    def get(rel, q_size, k_size):
        coords_q = jnp.arange(q_size)[:, None]
        coords_k = jnp.arange(k_size)[None, :]
        rel_idx = coords_q - coords_k + (k_size - 1)
        return rel[rel_idx]                            # (q, k, dim)
    Rh = get(rel_h, qh, kh)
    Rw = get(rel_w, qw, kw)
    q_r = q.reshape(-1, qh, qw, dim_head)
    bias_h = jnp.einsum("bhwc,hkc->bhwk", q_r, Rh)     # (B*, qh, qw, kh)
    bias_w = jnp.einsum("bhwc,wkc->bhwk", q_r, Rw)     # (B*, qh, qw, kw)
    return bias_h[..., :, None] + bias_w[..., None, :]  # (B*, qh, qw, kh, kw)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    input_hw: Tuple[int, int]
    use_rel_pos: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, D)
        B, H, W, D = x.shape
        dh = D // self.heads
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.heads, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]               # (B, h, HW, dh)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * dh ** -0.5, k,
                          preferred_element_type=jnp.float32)
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_hw[0] - 1, dh))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_hw[1] - 1, dh))
            bias = _rel_pos_bias((H, W), (H, W), rel_h, rel_w,
                                 q.reshape(B * self.heads, H * W, dh), dh)
            attn = attn + bias.reshape(B, self.heads, H * W, H * W)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, D)
        return nn.Dense(D, dtype=self.dtype, name="proj")(out)


def _window_partition(x, w):
    B, H, W, C = x.shape
    ph = (w - H % w) % w
    pw = (w - W % w) % w
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // w, w, Wp // w, w, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w, w, C), (Hp, Wp)


def _window_unpartition(x, w, hw_pad, hw):
    Hp, Wp = hw_pad
    H, W = hw
    B = x.shape[0] // (Hp // w * Wp // w)
    x = x.reshape(B, Hp // w, Wp // w, w, w, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hp, Wp, -1)[:, :H, :W]


class ViTDetBlock(nn.Module):
    dim: int
    heads: int
    window: int        # 0 = global attention
    grid: int          # full grid size (64 for 1024 input)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.window > 0:
            win, hw_pad = _window_partition(h, self.window)
            win = WindowAttention(self.dim, self.heads,
                                  (self.window, self.window),
                                  dtype=self.dtype, name="attn")(win)
            h = _window_unpartition(win, self.window, hw_pad, x.shape[1:3])
        else:
            h = WindowAttention(self.dim, self.heads, (self.grid, self.grid),
                                dtype=self.dtype, name="attn")(h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class SamImageEncoder(nn.Module):
    variant: str = "vit_b"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (B, 1024, 1024, 3) normalised
        dim, depth, heads, global_idx = SAM_SPECS[self.variant]
        grid = x.shape[1] // PATCH
        h = nn.Conv(dim, (PATCH, PATCH), (PATCH, PATCH), dtype=self.dtype,
                    name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, grid, grid, dim))
        h = h + pos
        interm = []
        for i in range(depth):
            win = 0 if i in global_idx else WINDOW
            h = ViTDetBlock(dim, heads, win, grid, self.dtype,
                            name=f"block{i}")(h)
            if i in global_idx:
                interm.append(h)
        # neck: 2 convs to 256ch with LayerNorm2d
        n = nn.Conv(EMBED, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_conv1")(h)
        n = nn.LayerNorm(dtype=self.dtype, name="neck_ln1")(n)
        n = nn.Conv(EMBED, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(n)
        n = nn.LayerNorm(dtype=self.dtype, name="neck_ln2")(n)
        return n, interm  # (B, 64, 64, 256), early features for HQ


class PromptEncoder(nn.Module):
    """Box prompts only (the reference uses box-prompted SAM exclusively)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, boxes):  # (B, N, 4) in 1024-space -> (B, N, 2, 256)
        scale = self.param("pe_gaussian", nn.initializers.normal(1.0),
                           (2, EMBED // 2))
        corner_embed = self.param("corner_embed", nn.initializers.normal(0.02),
                                  (2, EMBED))

        def encode_points(pts):  # (..., 2) in [0, 1]
            proj = (2.0 * pts - 1.0) @ scale * (2 * np.pi)
            return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)

        corners = boxes.reshape(*boxes.shape[:-1], 2, 2) / IMG_SIZE
        pe = encode_points(corners)                    # (B, N, 2, 256)
        return pe + corner_embed


class TwoWayAttention(nn.Module):
    heads: int = 8
    down: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, q, k, v):
        d = EMBED // self.down
        dh = d // self.heads
        qp = nn.Dense(d, dtype=self.dtype, name="q")(q)
        kp = nn.Dense(d, dtype=self.dtype, name="k")(k)
        vp = nn.Dense(d, dtype=self.dtype, name="v")(v)

        def split(x):
            return x.reshape(*x.shape[:-1], self.heads, dh).swapaxes(-3, -2)
        a = jnp.einsum("...hqd,...hkd->...hqk", split(qp) * dh ** -0.5,
                       split(kp), preferred_element_type=jnp.float32)
        a = jax.nn.softmax(a, -1).astype(self.dtype)
        o = jnp.einsum("...hqk,...hkd->...hqd", a, split(vp))
        o = o.swapaxes(-3, -2).reshape(*q.shape[:-1], d)
        return nn.Dense(EMBED, dtype=self.dtype, name="out")(o)


class TwoWayBlock(nn.Module):
    dtype: Any = jnp.bfloat16
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, tokens, image, token_pe, image_pe):
        # self attention on tokens
        q = tokens if self.skip_first_pe else tokens + token_pe
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            tokens + TwoWayAttention(down=1, dtype=self.dtype,
                                     name="self_attn")(q, q, tokens))
        # token -> image cross attention
        q = tokens + token_pe
        k = image + image_pe
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            tokens + TwoWayAttention(dtype=self.dtype,
                                     name="cross_t2i")(q, k, image))
        # mlp
        h = nn.Dense(2048, dtype=self.dtype, name="mlp_fc1")(tokens)
        h = nn.Dense(EMBED, dtype=self.dtype, name="mlp_fc2")(nn.relu(h))
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm3")(tokens + h)
        # image -> token cross attention
        q = image + image_pe
        k = tokens + token_pe
        image = nn.LayerNorm(dtype=self.dtype, name="norm4")(
            image + TwoWayAttention(dtype=self.dtype,
                                    name="cross_i2t")(q, k, tokens))
        return tokens, image


class MaskDecoder(nn.Module):
    """Two-way transformer + hypernetwork upscaling (box -> 1 mask).

    With hq=True this is the SAM-HQ decoder: an extra learnable HQ output
    token and a global/local feature-fusion branch (early + final ViT
    features compressed to the upscaled embedding space); the returned mask
    is the HQ one, as the reference's sam_hq checkpoints produce.
    """

    num_multimask: int = 3
    hq: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image_embed, image_pe, prompt_tokens,
                 early_feat=None, final_feat=None):
        # image_embed: (B, 64, 64, 256); prompt_tokens: (B, N, 2, 256)
        B, H, W, D = image_embed.shape
        N = prompt_tokens.shape[1]
        n_mask_tokens = self.num_multimask + 1 + (1 if self.hq else 0)
        iou_token = self.param("iou_token", nn.initializers.normal(0.02), (1, D))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(0.02),
                                 (n_mask_tokens, D))
        out_tokens = jnp.concatenate([iou_token, mask_tokens], 0)  # (1+M, D)
        tokens = jnp.concatenate(
            [jnp.tile(out_tokens[None, None], (B, N, 1, 1)), prompt_tokens], 2)
        T = tokens.shape[2]

        img = jnp.tile(image_embed.reshape(B, 1, H * W, D), (1, N, 1, 1))
        pe = jnp.tile(image_pe.reshape(1, 1, H * W, D), (B, N, 1, 1))
        token_pe = tokens  # SAM uses the prompt tokens themselves as pe

        t, im = tokens, img
        t, im = TwoWayBlock(self.dtype, skip_first_pe=True, name="block0")(
            t, im, token_pe, pe)
        t, im = TwoWayBlock(self.dtype, name="block1")(t, im, token_pe, pe)
        # final token->image attention
        q = t + token_pe
        t = nn.LayerNorm(dtype=self.dtype, name="final_norm")(
            t + TwoWayAttention(dtype=self.dtype, name="final_attn")(
                q, im + pe, im))

        mask_out = t[:, :, 1:1 + n_mask_tokens]        # (B, N, M, D)
        src = im.reshape(B, N, H, W, D)

        # upscale 4x via two transposed convs
        up = nn.ConvTranspose(D // 4, (2, 2), (2, 2), dtype=self.dtype,
                              name="upscale1")(src.reshape(B * N, H, W, D))
        up = nn.gelu(nn.LayerNorm(dtype=self.dtype, name="upscale_ln")(up))
        up = nn.ConvTranspose(D // 8, (2, 2), (2, 2), dtype=self.dtype,
                              name="upscale2")(up)
        up = nn.gelu(up)                               # (B*N, 4H, 4W, D/8)

        def hyper_mlp(tok, name):
            h = tok
            for i in range(2):
                h = nn.relu(nn.Dense(D, dtype=self.dtype,
                                     name=f"{name}_fc{i + 1}")(h))
            return nn.Dense(D // 8, dtype=self.dtype, name=f"{name}_fc3")(h)

        if self.hq and early_feat is not None and final_feat is not None:
            # HQ branch: compress early + final ViT features into the
            # upscaled embedding space and add them (SAM-HQ fusion)
            hq_feat = nn.ConvTranspose(D // 8, (4, 4), (4, 4),
                                       dtype=self.dtype,
                                       name="hq_compress_early")(early_feat)
            hq_feat = hq_feat + nn.ConvTranspose(
                D // 8, (4, 4), (4, 4), dtype=self.dtype,
                name="hq_compress_final")(final_feat)   # (B, 4H, 4W, D/8)
            up = up.reshape(B, N, 4 * H, 4 * W, D // 8) + hq_feat[:, None]
            hyper = hyper_mlp(mask_out[:, :, -1], "hyper_hq")  # HQ token
        else:
            up = up.reshape(B, N, 4 * H, 4 * W, D // 8)
            hyper = hyper_mlp(mask_out[:, :, 0], "hyper")

        masks = jnp.einsum("bnhwc,bnc->bnhw", up, hyper)
        return masks.astype(jnp.float32)               # (B, N, 256, 256) logits


class Sam(nn.Module):
    """Full box-prompted SAM: image + boxes -> per-box mask logits at 256px
    (upsample/crop to the original frame on host)."""

    variant: str = "vit_b"
    hq: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images, boxes):
        enc, interm = SamImageEncoder(self.variant, self.dtype,
                                      name="image_encoder")(images)
        grid = enc.shape[1]
        # dense positional encoding over the embedding grid
        pe_scale = self.param("dense_pe", nn.initializers.normal(1.0),
                              (2, EMBED // 2))
        ys = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
        xs = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        coords = jnp.stack([gx, gy], -1)
        proj = (2 * coords - 1) @ pe_scale * (2 * np.pi)
        image_pe = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)

        prompts = PromptEncoder(self.dtype, name="prompt_encoder")(boxes)
        early = interm[0] if (self.hq and interm) else None
        return MaskDecoder(hq=self.hq, dtype=self.dtype, name="mask_decoder")(
            enc, image_pe, prompts, early_feat=early, final_feat=enc)


def preprocess_sam(images: Sequence[np.ndarray]) -> np.ndarray:
    """Resize-longest-side-1024 + pad + SAM pixel stats."""
    from PIL import Image
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    out = np.zeros((len(images), IMG_SIZE, IMG_SIZE, 3), np.float32)
    for i, img in enumerate(images):
        h, w = img.shape[:2]
        s = IMG_SIZE / max(h, w)
        nh, nw = int(round(h * s)), int(round(w * s))
        r = np.asarray(Image.fromarray(img.astype(np.uint8)).resize((nw, nh),
                                                                    Image.BILINEAR))
        out[i, :nh, :nw] = (r - mean) / std
    return out


# ---------------------------------------------------------------------------
# torch checkpoint conversion (segment_anything / sam-hq naming)
# ---------------------------------------------------------------------------

def convert_torch_checkpoint(state_dict, variant: str = "vit_b",
                             hq: bool = True):
    """Map a released sam_(hq_)vit_*.pth state_dict onto this parameter
    tree. Accepts numpy-valued dicts. Depth/head counts from SAM_SPECS.

    Coverage notes (kept in sync with the module structure):
      * image encoder: patch embed, pos embed, windowed/global blocks with
        decomposed rel-pos, 2-conv neck (LayerNorm2d -> LayerNorm over C);
      * prompt encoder: positional gaussian matrix + box-corner type
        embeddings (point_embeddings 2 and 3 in the official layout);
      * mask decoder: two-way blocks, final attention, upscaling convs,
        hypernetwork MLP (token 0), iou/mask tokens;
      * HQ extras: hf_token, compress_vit_feat / embedding_encoder fusion
        (mapped onto hq_compress_early / hq_compress_final).
    """
    import numpy as np
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    dim, depth, heads, global_idx = SAM_SPECS[variant]

    def conv(w):
        return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO

    def convT(w):
        return np.transpose(w, (2, 3, 1, 0))  # torch ConvTranspose IOHW->HWOI? see note

    enc = {}
    enc["patch_embed"] = {
        "kernel": conv(sd["image_encoder.patch_embed.proj.weight"]),
        "bias": sd["image_encoder.patch_embed.proj.bias"]}
    enc["pos_embed"] = sd["image_encoder.pos_embed"]
    for i in range(depth):
        p = f"image_encoder.blocks.{i}."
        blk = {
            "norm1": {"scale": sd[p + "norm1.weight"], "bias": sd[p + "norm1.bias"]},
            "norm2": {"scale": sd[p + "norm2.weight"], "bias": sd[p + "norm2.bias"]},
            "attn": {
                "qkv": {"kernel": sd[p + "attn.qkv.weight"].T,
                        "bias": sd[p + "attn.qkv.bias"]},
                "proj": {"kernel": sd[p + "attn.proj.weight"].T,
                         "bias": sd[p + "attn.proj.bias"]},
                "rel_pos_h": sd[p + "attn.rel_pos_h"],
                "rel_pos_w": sd[p + "attn.rel_pos_w"],
            },
            "mlp_fc1": {"kernel": sd[p + "mlp.lin1.weight"].T,
                        "bias": sd[p + "mlp.lin1.bias"]},
            "mlp_fc2": {"kernel": sd[p + "mlp.lin2.weight"].T,
                        "bias": sd[p + "mlp.lin2.bias"]},
        }
        enc[f"block{i}"] = blk
    enc["neck_conv1"] = {"kernel": conv(sd["image_encoder.neck.0.weight"])}
    enc["neck_ln1"] = {"scale": sd["image_encoder.neck.1.weight"],
                       "bias": sd["image_encoder.neck.1.bias"]}
    enc["neck_conv2"] = {"kernel": conv(sd["image_encoder.neck.2.weight"])}
    enc["neck_ln2"] = {"scale": sd["image_encoder.neck.3.weight"],
                       "bias": sd["image_encoder.neck.3.bias"]}

    prompt = {
        "pe_gaussian": sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"],
        # box prompts use corner-type embeddings 2 (top-left) and 3
        # (bottom-right) in the official layout
        "corner_embed": np.stack([
            sd["prompt_encoder.point_embeddings.2.weight"][0],
            sd["prompt_encoder.point_embeddings.3.weight"][0]]),
    }

    dec = {}
    md = "mask_decoder."
    dec["iou_token"] = sd[md + "iou_token.weight"]
    dec["mask_tokens"] = sd[md + "mask_tokens.weight"]
    if hq and md + "hf_token.weight" in sd:
        dec["mask_tokens"] = np.concatenate(
            [sd[md + "mask_tokens.weight"], sd[md + "hf_token.weight"]], 0)

    def attn(prefix):
        return {
            "q": {"kernel": sd[prefix + "q_proj.weight"].T,
                  "bias": sd[prefix + "q_proj.bias"]},
            "k": {"kernel": sd[prefix + "k_proj.weight"].T,
                  "bias": sd[prefix + "k_proj.bias"]},
            "v": {"kernel": sd[prefix + "v_proj.weight"].T,
                  "bias": sd[prefix + "v_proj.bias"]},
            "out": {"kernel": sd[prefix + "out_proj.weight"].T,
                    "bias": sd[prefix + "out_proj.bias"]},
        }

    for bi in range(2):
        tp = f"{md}transformer.layers.{bi}."
        dec[f"block{bi}"] = {
            "self_attn": attn(tp + "self_attn."),
            "cross_t2i": attn(tp + "cross_attn_token_to_image."),
            "cross_i2t": attn(tp + "cross_attn_image_to_token."),
            "norm1": {"scale": sd[tp + "norm1.weight"], "bias": sd[tp + "norm1.bias"]},
            "norm2": {"scale": sd[tp + "norm2.weight"], "bias": sd[tp + "norm2.bias"]},
            "norm3": {"scale": sd[tp + "norm3.weight"], "bias": sd[tp + "norm3.bias"]},
            "norm4": {"scale": sd[tp + "norm4.weight"], "bias": sd[tp + "norm4.bias"]},
            "mlp_fc1": {"kernel": sd[tp + "mlp.lin1.weight"].T,
                        "bias": sd[tp + "mlp.lin1.bias"]},
            "mlp_fc2": {"kernel": sd[tp + "mlp.lin2.weight"].T,
                        "bias": sd[tp + "mlp.lin2.bias"]},
        }
    dec["final_attn"] = attn(md + "transformer.final_attn_token_to_image.")
    dec["final_norm"] = {
        "scale": sd[md + "transformer.norm_final_attn.weight"],
        "bias": sd[md + "transformer.norm_final_attn.bias"]}
    dec["upscale1"] = {"kernel": convT(sd[md + "output_upscaling.0.weight"]),
                       "bias": sd[md + "output_upscaling.0.bias"]}
    dec["upscale_ln"] = {"scale": sd[md + "output_upscaling.1.weight"],
                         "bias": sd[md + "output_upscaling.1.bias"]}
    dec["upscale2"] = {"kernel": convT(sd[md + "output_upscaling.3.weight"]),
                       "bias": sd[md + "output_upscaling.3.bias"]}
    hyper_name = "hyper_hq" if hq and md + "hf_mlp.layers.0.weight" in sd \
        else "hyper"
    mlp_src = md + ("hf_mlp.layers." if hyper_name == "hyper_hq"
                    else "output_hypernetworks_mlps.0.layers.")
    for li, dst in enumerate((f"{hyper_name}_fc1", f"{hyper_name}_fc2",
                              f"{hyper_name}_fc3")):
        dec[dst] = {"kernel": sd[mlp_src + f"{li}.weight"].T,
                    "bias": sd[mlp_src + f"{li}.bias"]}
    if hq and md + "compress_vit_feat.0.weight" in sd:
        dec["hq_compress_early"] = {
            "kernel": convT(sd[md + "compress_vit_feat.0.weight"]),
            "bias": sd[md + "compress_vit_feat.0.bias"]}
        dec["hq_compress_final"] = {
            "kernel": convT(sd[md + "embedding_encoder.0.weight"]),
            "bias": sd[md + "embedding_encoder.0.bias"]}

    return {"image_encoder": enc, "prompt_encoder": prompt,
            "mask_decoder": dec, "dense_pe":
            sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]}
