"""Depth Anything V2 (metric) in flax: DINOv2 ViT encoder + DPT head.

Re-design of the vendored reference model (depth/metric_depth/
depth_anything_v2/dpt.py + dinov2.py, SURVEY §2.2): same architecture
family — a plain ViT (patch 14, cls token, 4 intermediate taps) feeding a
DPT decoder (reassemble -> 4-level fusion -> sigmoid * max_depth for metric
models) — expressed TPU-first:
  * batched NHWC throughout (the reference infers one image at a time,
    generate_depth_maps.py:85 — the #1 reason it is slow);
  * static 518x518 input (multiple of 14), bf16 matmuls on the MXU;
  * attention as one fused dot-product (no custom CUDA);
  * torchvision-free preprocessing lives in the caller.

`convert_torch_checkpoint` maps the released .pth state_dicts onto this
parameter tree (vits/vitb/vitl).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

VIT_SPECS = {
    # embed_dim, depth, heads, dpt_features, dpt_out_channels
    "vits": (384, 12, 6, 64, (48, 96, 192, 384)),
    "vitb": (768, 12, 12, 128, (96, 192, 384, 768)),
    "vitl": (1024, 24, 16, 256, (256, 512, 1024, 1024)),
}
# intermediate tap layers per variant (reference dpt.py intermediate_layer_idx)
TAP_LAYERS = {"vits": (2, 5, 8, 11), "vitb": (2, 5, 8, 11),
              "vitl": (4, 11, 17, 23)}


def _fused_sdpa(q, k, v, scale, seg=None):
    """Pallas flash attention on TPU (never materialises the (N, N) score
    matrix — at DAv2-L scale that matrix is ~1.9 GB/layer of HBM traffic,
    the main non-matmul cost of the encoder). `seg` is an optional (B, N)
    int mask of real tokens: when given, N must already be a 512 multiple
    (the encoder pads ONCE at entry instead of every layer); when absent
    the sequence is padded to a block multiple here and sliced back.
    Falls back to an unfused einsum path off-TPU (tests run on CPU)."""
    B, H, N, d = q.shape
    try:
        if jax.devices()[0].platform not in ("tpu", "axon"):
            raise RuntimeError("not on tpu")
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention)
        blk = 512
        Np = -(-N // blk) * blk
        if seg is None:
            # pad into fresh names so the einsum fallback below always sees
            # the original unpadded q/k/v even if flash_attention raises
            pad = Np - N
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            seg_ = (jnp.arange(Np) < N).astype(jnp.int32)[None].repeat(B, 0)
        else:
            assert N == Np, "pre-padded path requires N % 512 == 0"
            qp, kp, vp, seg_ = q, k, v, seg
        # the kernel's DEFAULT block sizes (block_k 128) run at ~4% MFU at
        # DAv2-L shapes (B16 H16 N1536 d64): 18 ms/layer, 36x slower than
        # 512-wide blocks which sit near the attention roofline (measured
        # 2026-08-20 on v5e); 768-wide is another ~1% faster at the 518 px
        # canon (Np=1536) and is auto-picked when it divides Np.
        # WEAKCUBE_FLASH_BLOCK overrides (must divide Np, trace-time only).
        import os
        default = 768 if Np % 768 == 0 else 512
        fb = int(os.environ.get("WEAKCUBE_FLASH_BLOCK", default))
        bs = BlockSizes(block_q=min(fb, Np), block_k_major=min(fb, Np),
                        block_k=min(fb, Np), block_b=1)
        out = flash_attention(qp, kp, vp,
                              segment_ids=SegmentIds(q=seg_, kv=seg_),
                              causal=False, sm_scale=scale, block_sizes=bs)
        return out[:, :, :N]
    except Exception:
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        if seg is not None:
            attn = jnp.where(seg[:, None, None, :] == 0, -1e30, attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


class _QKVEinsum(nn.Module):
    """Fused qkv projection emitting (B, H, N, d) directly: three einsums
    against sliced views of the SAME (D, 3D) parameter the torch converter
    fills, letting XLA fold the head transpose into the matmul output
    layout instead of permuting the (B, N, 3D) tensor afterwards."""

    dim: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        D, H = self.dim, self.heads
        d = D // H
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (D, 3 * D)).astype(self.dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (3 * D,)).astype(self.dtype)
        parts = []
        for i in range(3):
            w = kern[:, i * D:(i + 1) * D].reshape(D, H, d)
            b = bias[i * D:(i + 1) * D].reshape(H, d)
            parts.append(jnp.einsum("bnd,dhk->bhnk", x, w)
                         + b[None, :, None, :])
        return parts


class Attention(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, seg=None):
        import os
        B, N, D = x.shape
        H, d = self.heads, D // self.heads
        scale = d ** -0.5
        # default ON: measured 67.4 -> 76.7 img/s at DAv2-L B48 on v5e
        # (2026-08-20) vs the Dense-then-transpose formulation; identical
        # numerics and parameter tree (WEAKCUBE_QKV_EINSUM=0 reverts)
        if os.environ.get("WEAKCUBE_QKV_EINSUM", "1") not in ("", "0"):
            q, k, v = _QKVEinsum(self.dim, H, self.dtype, name="qkv")(x)
        else:
            qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
            q, k, v = jnp.split(qkv.reshape(B, N, 3, H, d)
                                .transpose(2, 0, 3, 1, 4), 3, axis=0)
            q, k, v = q[0], k[0], v[0]                   # (B, H, N, d)
        out = _fused_sdpa(q, k, v, scale, seg)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, seg=None):
        # cast the layer-scale gammas to the compute dtype so the residual
        # stream stays bf16 end-to-end: an f32 gamma would promote x + h*ls
        # to f32 and double the HBM traffic of every residual add in all 24
        # layers (~200 MB/layer at DAv2-L B16)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = Attention(self.dim, self.heads, self.dtype, name="attn")(h, seg)
        ls1 = self.param("ls1_gamma", nn.initializers.ones, (self.dim,))
        x = x + h * ls1.astype(self.dtype)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp_fc1")(h)
        # exact (erf) GELU: torch nn.GELU defaults to the exact form
        # (dinov2.py act_layer=nn.GELU); flax's default tanh approximation
        # drifts ~1e-3 per layer against converted checkpoints
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        ls2 = self.param("ls2_gamma", nn.initializers.ones, (self.dim,))
        return x + h * ls2.astype(self.dtype)


class DINOv2(nn.Module):
    """Plain ViT encoder returning the 4 tapped patch-token maps.

    pad_mode picks where the flash-attention 512-multiple sequence padding
    happens (N = 1370 at the 518 px canon):
      * "once" (default): pad the token stream to 1536 at entry and thread
        segment ids; every matmul is 128-aligned but computes 12% dead
        rows. Measured FASTER on v5e (2026-08-20 sweep: 59.7 vs 57.4 img/s
        at B16) — the aligned matmuls beat the pad-row FLOP waste.
      * "attn": dense layers run at the REAL N; q/k/v are padded inside
        each attention call and sliced back (4 extra copies per layer).
    """

    variant: str = "vitl"
    patch: int = 14
    dtype: Any = jnp.bfloat16
    pad_mode: str = "once"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        dim, depth, heads, _, _ = VIT_SPECS[self.variant]
        B, H, W, _ = x.shape
        gh, gw = H // self.patch, W // self.patch
        tokens = nn.Conv(dim, (self.patch, self.patch),
                         (self.patch, self.patch), dtype=self.dtype,
                         name="patch_embed")(x).reshape(B, gh * gw, dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw + 1, dim))
        # keep the residual stream in the compute dtype (see Block)
        tokens = (jnp.concatenate([jnp.tile(cls, (B, 1, 1)), tokens], 1)
                  + pos).astype(self.dtype)

        N = gh * gw + 1
        seg = None
        if self.pad_mode == "once":
            Np = -(-N // 512) * 512
            tokens = jnp.pad(tokens, ((0, 0), (0, Np - N), (0, 0)))
            seg = (jnp.arange(Np) < N).astype(jnp.int32)[None].repeat(B, 0)

        taps = set(TAP_LAYERS[self.variant])
        # every tap goes through the encoder's FINAL LayerNorm before the
        # DPT head — dinov2.py get_intermediate_layers defaults norm=True
        # and dpt.py calls it without overriding
        final_norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        outs = []
        for i in range(depth):
            tokens = Block(dim, heads, self.dtype, name=f"block{i}")(tokens,
                                                                     seg)
            if i in taps:
                outs.append(final_norm(tokens)[:, 1:N].reshape(B, gh, gw,
                                                               dim))
        return outs


class ResidualConvUnit(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        return x + h


def _ac_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) align_corners=True bilinear interpolation matrix — static
    (host numpy at trace time), so each resize is one small MXU matmul per
    axis instead of a gather. Matches torch F.interpolate(align_corners=
    True): src = i * (in-1)/(out-1)."""
    W = np.zeros((out_size, in_size), np.float32)
    if in_size == 1 or out_size == 1:
        W[:, 0] = 1.0
        return W
    src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    lo = np.minimum(np.floor(src).astype(np.int64), in_size - 2)
    f = (src - lo).astype(np.float32)
    W[np.arange(out_size), lo] += 1.0 - f
    W[np.arange(out_size), lo + 1] += f
    return W


def _resize(x, hw):
    """align_corners=True bilinear (the reference decoder's only resize
    mode, blocks.py:144 and dpt.py:146)."""
    if tuple(x.shape[1:3]) == tuple(hw):
        return x
    wy = jnp.asarray(_ac_matrix(hw[0], x.shape[1]), x.dtype)
    wx = jnp.asarray(_ac_matrix(hw[1], x.shape[2]), x.dtype)
    x = jnp.einsum("Oh,bhwc->bOwc", wy, x)
    return jnp.einsum("Ow,bhwc->bhOc", wx, x)


class _BlockUpsample(nn.Module):
    """torch ConvTranspose2d with kernel_size == stride == k (the DPT
    resize_layers, dpt.py:61-73): every input pixel expands into a learned
    k x k output block — expressed as one einsum + reshape (no overlap, so
    a real transposed conv is overkill)."""

    features: int
    k: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (self.k, self.k, C, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        h = jnp.einsum("bijc,hwco->bihjwo", x, kern.astype(self.dtype))
        h = h.reshape(B, H * self.k, W * self.k, self.features)
        return h + bias.astype(self.dtype)


class DPTHead(nn.Module):
    """Reassemble + fusion decoder -> metric depth. Faithful graph of the
    reference DPTHead (dpt.py:38-149 + util/blocks.py): learned resize
    layers (ConvTranspose 4x/2x, identity, strided 3x3), refinenet fusion
    where resConfUnit1 transforms the LATERAL and the upsample+1x1 out_conv
    close each block, then output_conv1 -> full-res resize -> output_conv2.
    All interpolation is align_corners=True bilinear like the reference."""

    variant: str = "vitl"
    max_depth: float = 20.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, taps: Sequence[jnp.ndarray], out_hw: Tuple[int, int]):
        dim, _, _, features, out_ch = VIT_SPECS[self.variant]
        B, gh, gw, _ = taps[0].shape
        # reassemble: 1x1 project + learned rescale to (4, 2, 1, 0.5)x grid
        # (dpt.py projects + resize_layers), then the 3x3 no-bias scratch
        # convs onto the common `features` width
        levels = []
        for i, (t, ch) in enumerate(zip(taps, out_ch)):
            h = nn.Conv(ch, (1, 1), dtype=self.dtype, name=f"project{i}")(t)
            if i == 0:
                h = _BlockUpsample(ch, 4, self.dtype, name="resize0")(h)
            elif i == 1:
                h = _BlockUpsample(ch, 2, self.dtype, name="resize1")(h)
            elif i == 3:
                h = nn.Conv(ch, (3, 3), (2, 2), padding=1,
                            dtype=self.dtype, name="resize3")(h)
            h = nn.Conv(features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"scratch{i}")(h)
            levels.append(h)

        # top-down fusion, coarsest first (dpt.py:140-143). Each refinenet:
        #   path = out_conv(up(rcu_out(path + rcu_skip(lateral)), size))
        # where rcu_skip (resConfUnit1) is absent for the coarsest block and
        # `size` is the NEXT lateral's resolution (scale 2 for the last).
        path = None
        for i in range(3, -1, -1):
            if path is None:
                h = levels[i]
            else:
                h = path + ResidualConvUnit(features, self.dtype,
                                            name=f"rcu_skip{i}")(levels[i])
            h = ResidualConvUnit(features, self.dtype, name=f"rcu_out{i}")(h)
            if i > 0:
                target = levels[i - 1].shape[1:3]
            else:
                target = (2 * h.shape[1], 2 * h.shape[2])
            h = _resize(h, target)
            path = nn.Conv(features, (1, 1), dtype=self.dtype,
                           name=f"fusion_out{i}")(h)

        h = nn.Conv(features // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="out_conv1")(path)
        h = _resize(h, out_hw)
        h = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="out_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), dtype=self.dtype, name="out_conv3")(h)
        # metric head: sigmoid * max_depth (dpt.py:108-114,183)
        return jax.nn.sigmoid(h.astype(jnp.float32))[..., 0] * self.max_depth


class DepthAnythingV2(nn.Module):
    """Metric depth model; input (B, H, W, 3) ImageNet-normalised, H/W
    multiples of 14 (inference canon: 518)."""

    variant: str = "vitl"
    max_depth: float = 20.0
    dtype: Any = jnp.bfloat16
    pad_mode: str = "once"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        taps = DINOv2(self.variant, dtype=self.dtype,
                      pad_mode=self.pad_mode, name="backbone")(x)
        return DPTHead(self.variant, self.max_depth, self.dtype,
                       name="head")(taps, x.shape[1:3])


# --------------------------------------------------------------------------
# torch checkpoint conversion
# --------------------------------------------------------------------------

def convert_torch_checkpoint(state_dict: Dict[str, "np.ndarray"],
                             variant: str = "vitl") -> Dict:
    """Map a released depth_anything_v2_metric_*.pth state_dict onto this
    parameter tree. Accepts numpy-valued dicts (call .numpy() on torch
    tensors upstream). Returns a flax params dict.
    """
    dim, depth, heads, features, out_ch = VIT_SPECS[variant]
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict = {"backbone": {}, "head": {}}
    bb = p["backbone"]

    def conv_kernel(w):  # torch OIHW -> flax HWIO
        return np.transpose(w, (2, 3, 1, 0))

    bb["patch_embed"] = {
        "kernel": conv_kernel(sd["pretrained.patch_embed.proj.weight"]),
        "bias": sd["pretrained.patch_embed.proj.bias"]}
    bb["cls_token"] = sd["pretrained.cls_token"]
    bb["pos_embed"] = sd["pretrained.pos_embed"]
    for i in range(depth):
        pre = f"pretrained.blocks.{i}."
        blk = {
            "norm1": {"scale": sd[pre + "norm1.weight"], "bias": sd[pre + "norm1.bias"]},
            "norm2": {"scale": sd[pre + "norm2.weight"], "bias": sd[pre + "norm2.bias"]},
            "attn": {
                "qkv": {"kernel": sd[pre + "attn.qkv.weight"].T,
                        "bias": sd[pre + "attn.qkv.bias"]},
                "proj": {"kernel": sd[pre + "attn.proj.weight"].T,
                         "bias": sd[pre + "attn.proj.bias"]},
            },
            "mlp_fc1": {"kernel": sd[pre + "mlp.fc1.weight"].T,
                        "bias": sd[pre + "mlp.fc1.bias"]},
            "mlp_fc2": {"kernel": sd[pre + "mlp.fc2.weight"].T,
                        "bias": sd[pre + "mlp.fc2.bias"]},
            "ls1_gamma": sd.get(pre + "ls1.gamma", np.ones(dim, np.float32)),
            "ls2_gamma": sd.get(pre + "ls2.gamma", np.ones(dim, np.float32)),
        }
        bb[f"block{i}"] = blk
    # the encoder's final LayerNorm — applied to every tap
    # (get_intermediate_layers norm=True default)
    bb["norm"] = {"scale": sd["pretrained.norm.weight"],
                  "bias": sd["pretrained.norm.bias"]}

    hd = p["head"]
    for i in range(4):
        hd[f"project{i}"] = {
            "kernel": conv_kernel(sd[f"depth_head.projects.{i}.weight"]),
            "bias": sd[f"depth_head.projects.{i}.bias"]}
        hd[f"scratch{i}"] = {
            "kernel": conv_kernel(sd[f"depth_head.scratch.layer{i + 1}_rn.weight"])}
    # resize_layers: 0/1 are ConvTranspose2d with kernel==stride (torch
    # weight (C, O, kh, kw) -> our _BlockUpsample (kh, kw, C, O)); 3 is a
    # plain strided conv; 2 is Identity (no params)
    for i, key in ((0, "resize0"), (1, "resize1")):
        w = sd[f"depth_head.resize_layers.{i}.weight"]
        hd[key] = {"kernel": np.transpose(w, (2, 3, 0, 1)),
                   "bias": sd[f"depth_head.resize_layers.{i}.bias"]}
    hd["resize3"] = {
        "kernel": conv_kernel(sd["depth_head.resize_layers.3.weight"]),
        "bias": sd["depth_head.resize_layers.3.bias"]}
    for i in range(4):
        rn = f"depth_head.scratch.refinenet{i + 1}."
        if i < 3:
            # refinenet4's resConfUnit1 exists in checkpoints but is dead
            # (blocks.py:131 — only 2-input fusion blocks use it)
            hd[f"rcu_skip{i}"] = {
                "conv1": {"kernel": conv_kernel(sd[rn + "resConfUnit1.conv1.weight"]),
                          "bias": sd[rn + "resConfUnit1.conv1.bias"]},
                "conv2": {"kernel": conv_kernel(sd[rn + "resConfUnit1.conv2.weight"]),
                          "bias": sd[rn + "resConfUnit1.conv2.bias"]}}
        hd[f"rcu_out{i}"] = {
            "conv1": {"kernel": conv_kernel(sd[rn + "resConfUnit2.conv1.weight"]),
                      "bias": sd[rn + "resConfUnit2.conv1.bias"]},
            "conv2": {"kernel": conv_kernel(sd[rn + "resConfUnit2.conv2.weight"]),
                      "bias": sd[rn + "resConfUnit2.conv2.bias"]}}
        hd[f"fusion_out{i}"] = {
            "kernel": conv_kernel(sd[rn + "out_conv.weight"]),
            "bias": sd[rn + "out_conv.bias"]}
    hd["out_conv1"] = {
        "kernel": conv_kernel(sd["depth_head.scratch.output_conv1.weight"]),
        "bias": sd["depth_head.scratch.output_conv1.bias"]}
    hd["out_conv2"] = {
        "kernel": conv_kernel(sd["depth_head.scratch.output_conv2.0.weight"]),
        "bias": sd["depth_head.scratch.output_conv2.0.bias"]}
    hd["out_conv3"] = {
        "kernel": conv_kernel(sd["depth_head.scratch.output_conv2.2.weight"]),
        "bias": sd["depth_head.scratch.output_conv2.2.bias"]}
    return p


def preprocess_images(images: Sequence[np.ndarray],
                      input_size: int = 518) -> np.ndarray:
    """Batched ImageNet-normalised square inputs (the reference's
    infer_image resize-to-518, multiple-of-14, dpt.py:188-222)."""
    from PIL import Image
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    out = np.zeros((len(images), input_size, input_size, 3), np.float32)
    for i, img in enumerate(images):
        pil = Image.fromarray(img.astype(np.uint8))
        out[i] = np.asarray(pil.resize((input_size, input_size),
                                       Image.BICUBIC), np.float32) / 255.0
        out[i] = (out[i] - mean) / std
    return out
