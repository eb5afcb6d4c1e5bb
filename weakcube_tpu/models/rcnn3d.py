"""Meta-architectures: RCNN3D (supervised) and RCNN3D_combined_features
(weak), plus the registry-driven build_model.

Re-design of cubercnn/modeling/meta_arch/rcnn3d.py:
  * RCNN3D (rcnn3d.py:34-263): backbone -> RPN -> ROIHeads3D, per-image
    intrinsics K threaded to the heads.
  * RCNN3D_combined_features (rcnn3d.py:265-592): adds depth_map/ground_map
    plumbing for the weak losses.

TPU-first: the model is a pure function of a padded batch dict; image
normalisation/padding happens in the data pipeline; anchors are trace-time
constants derived from the static image size.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..structures import GroundTruth, Proposals
from . import anchors as anchor_lib
from . import rpn as rpn_lib
from .backbone.build import build_backbone
from .roi_heads import ROIHeads3D, ROIHeads3DScore

META_ARCH_REGISTRY: Dict[str, Callable] = {}


def register_meta_arch(name):
    def deco(fn):
        META_ARCH_REGISTRY[name] = fn
        return fn
    return deco


class RCNN3DBase(nn.Module):
    """Backbone + RPN + 3D ROI heads over a static padded batch."""

    cfg: Any
    roi_heads_cls: type
    dims_priors: Optional[np.ndarray] = None
    z_scales: Optional[np.ndarray] = None
    z_stats: Optional[np.ndarray] = None
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.backbone = build_backbone(cfg, self.dtype)
        n_anchor = len(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0])
        self.rpn_head = rpn_lib.RPNHead(num_anchors=n_anchor, dtype=self.dtype)
        # keep priors as host numpy constants (jnp arrays as module
        # attributes leak tracers under jit); converted at use site
        self.roi_heads = self.roi_heads_cls(
            cfg=cfg, num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            dims_priors=self.dims_priors, z_scales=self.z_scales,
            z_stats=self.z_stats, dtype=self.dtype)

    def _prep_image(self, image: jnp.ndarray) -> jnp.ndarray:
        """On-device pixel normalisation for uint8-transferred images
        (cfg.TPU.TRANSFER_UINT8, data/mapper.py): the data pipeline ships
        raw pixels (4x fewer bytes over host->device) and the reference's
        (x - PIXEL_MEAN) / PIXEL_STD runs here. f32 inputs pass through
        untouched (already normalised on host). Lives on the BASE class so
        every meta-arch (and the helper below) normalises before the
        backbone — a uint8 batch must never reach the convs raw (advisor
        r4)."""
        if image.dtype == jnp.uint8:
            mean = jnp.asarray(self.cfg.MODEL.PIXEL_MEAN, jnp.float32)
            std = jnp.asarray(self.cfg.MODEL.PIXEL_STD, jnp.float32)
            image = (image.astype(jnp.float32) - mean) / std
        return image

    def _features_and_proposals(self, batch, train, rng_rpn):
        feats_dict = self.backbone(self._prep_image(batch["image"]),
                                   train=train)
        return self._proposals_from_feats(feats_dict, batch, train, rng_rpn)

    def _proposals_from_feats(self, feats_dict, batch, train, rng_rpn):
        cfg = self.cfg
        in_feats = list(cfg.MODEL.RPN.IN_FEATURES)
        feats = [feats_dict[f] for f in in_feats]
        logits, deltas = self.rpn_head(feats)

        strides = [self.backbone.STRIDES[f] for f in in_feats]
        anchors_lvl = anchor_lib.pyramid_anchors(
            [f.shape[1:3] for f in feats], strides,
            cfg.MODEL.ANCHOR_GENERATOR.SIZES,
            cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
            cfg.MODEL.ANCHOR_GENERATOR.OFFSET)
        anchors_all = jnp.concatenate(anchors_lvl, axis=0)

        rpn_loss = {}
        if train:
            gt = batch["gt"]
            if "rpn_labels" in batch:
                # precomputed anchor labels (parallel.make_anchor_labeler):
                # labelling depends only on (rng, static anchors, gt), so it
                # can run in its own tiny program per step — bit-identical
                # when keyed with split(step_rng)[0]. This keeps the gt-only
                # IoU/sampling kernels out of the big grads program, one of
                # the two subgraphs that separate the libtpu-crashing
                # batch-as-argument matmul-fwd graph from the clean
                # batch-as-constant one (round-4 bisect).
                lab = batch["rpn_labels"]
            else:
                lab = rpn_lib.label_and_sample_anchors(
                    rng_rpn, anchors_all, gt,
                    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
                    cfg.MODEL.RPN.POSITIVE_FRACTION,
                    cfg.MODEL.RPN.IOU_THRESHOLDS,
                    [0, -1, 1],
                    cfg.MODEL.RPN.IGNORE_THRESHOLD)
            rpn_loss = rpn_lib.rpn_losses(
                anchors_all, jnp.concatenate(logits, 1),
                jnp.concatenate(deltas, 1), lab,
                cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
                tuple(cfg.MODEL.RPN.BBOX_REG_WEIGHTS),
                cfg.MODEL.RPN.SMOOTH_L1_BETA)
            rpn_loss = {k: v * cfg.MODEL.RPN.LOSS_WEIGHT for k, v in rpn_loss.items()}

        pre = cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN if train else cfg.MODEL.RPN.PRE_NMS_TOPK_TEST
        post = cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN if train else cfg.MODEL.RPN.POST_NMS_TOPK_TEST
        proposals = rpn_lib.select_proposals(
            anchors_lvl, [jax.lax.stop_gradient(l) for l in logits],
            [jax.lax.stop_gradient(d) for d in deltas],
            batch["image_wh"], pre, post, cfg.MODEL.RPN.NMS_THRESH,
            tuple(cfg.MODEL.RPN.BBOX_REG_WEIGHTS))
        return feats_dict, proposals, rpn_loss


@register_meta_arch("RCNN3D")
class RCNN3D(RCNN3DBase):
    """Supervised meta-arch (rcnn3d.py:34-263)."""

    roi_heads_cls: type = ROIHeads3D

    def _roi_extra(self, batch) -> Dict[str, Any]:
        return {}

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False,
                 rng: Optional[jax.Array] = None):
        feats_dict = self.backbone(self._prep_image(batch["image"]),
                                   train=train)
        return self.forward_from_features(feats_dict, batch, train, rng)

    def backbone_forward(self, image: jnp.ndarray, train: bool = False):
        """Backbone-only apply (image -> {p2..p6} pyramid): program 1 (and
        the re-run inside program 3) of the backbone-split train step
        (parallel/train_step.py split='backbone'). Keeping batch["image"]
        out of the program that holds the dense ROIAlign einsums is what
        dodges the libtpu fault (round-4 arg-narrowing bisect,
        tools/bench_escapes.py)."""
        return self.backbone(self._prep_image(image), train=train)

    def forward_from_features(self, feats_dict, batch, train: bool = False,
                              rng: Optional[jax.Array] = None):
        """Everything downstream of the backbone. Exposed as its own apply
        method so the backbone (the only consumer of batch["image"]) can
        run in a SEPARATE XLA program — the round-4 libtpu-fault escape
        compiles backbone-fwd / rest-fwd+bwd / backbone-bwd as three
        programs (parallel/train_step.py split="backbone")."""
        if train:
            r1, r2 = jax.random.split(rng)
        else:
            r1 = r2 = None
        feats, proposals, rpn_loss = self._proposals_from_feats(
            feats_dict, batch, train, r1)
        if train:
            losses, metrics = self.roi_heads(
                feats, proposals, batch["gt"], batch["K"], batch["image_wh"],
                train=True, rng=r2, metrics_tick=batch.get("metrics_tick"),
                **self._roi_extra(batch))
            losses.update(rpn_loss)
            return losses, metrics
        return self.roi_heads(feats, proposals, None, batch["K"],
                              batch["image_wh"], train=False)


@register_meta_arch("RCNN3D_combined_features")
class RCNN3DCombinedFeatures(RCNN3D):
    """Weak meta-arch with depth/ground-map plumbing (rcnn3d.py:265-592).

    batch extras: depth_map (B, H', W'), ground_mask (B, H', W') bool,
    ground_valid (B,) — the (1, 1) dummy-marker convention of the reference
    (rcnn3d.py:375-379) becomes an explicit validity flag.
    """

    roi_heads_cls: type = ROIHeads3DScore

    def _roi_extra(self, batch) -> Dict[str, Any]:
        # transfer-diet decode (cfg.TPU.TRANSFER_DEPTH_F16 /
        # TRANSFER_MASK_BITS, data/mapper.py): depth may arrive f16 and the
        # ground mask bit-packed — restore full precision/layout in-graph
        # before the weak losses consume them
        dm = batch.get("depth_map")
        if dm is not None and dm.dtype != jnp.float32:
            dm = dm.astype(jnp.float32)
        gm = batch.get("ground_mask")
        if gm is None and batch.get("ground_mask_bits") is not None:
            from ..ops.bitpack import unpack_mask_bits
            bits = batch["ground_mask_bits"]
            # canvas width: the rest program of the backbone split carries
            # no "image" key, so prefer the (same-canvas) depth map
            if dm is not None:
                w = dm.shape[2]
            elif "image" in batch:
                w = batch["image"].shape[2]
            else:
                w = bits.shape[-1] * 8
            gm = unpack_mask_bits(bits, w)
        return dict(depth_maps=dm,
                    ground_masks=gm,
                    ground_valid=batch.get("ground_valid"),
                    ground_normals=batch.get("ground_normal"),
                    ground_normal_valid=batch.get("ground_normal_valid"),
                    instance_masks=batch.get("instance_masks"))


def make_anchor_labeler(cfg, image_hw: Optional[tuple] = None):
    """Jitted `(step_rng, gt) -> RPNLabels`, bit-identical to the in-graph
    anchor labelling (same `jax.random.split(rng)[0]` key the meta-arch
    derives). Feed the result as `batch["rpn_labels"]` to move the gt-only
    IoU + sampling kernels into their own tiny XLA program — structurally
    identical math, but the big train program then takes the labels as
    plain inputs (round-4 libtpu-fault escape; see
    RCNN3DBase._features_and_proposals)."""
    if image_hw is None:
        s = cfg.TPU.IMAGE_SIZE
        image_hw = (s, s)
    in_feats = list(cfg.MODEL.RPN.IN_FEATURES)
    bb = build_backbone(cfg, jnp.float32)
    strides = [bb.STRIDES[f] for f in in_feats]
    # SAME-padded stride-s convs produce ceil(dim / s) maps — matches the
    # shapes the backbone emits for every canvas the buckets produce
    shapes = [(-(-image_hw[0] // s), -(-image_hw[1] // s)) for s in strides]
    anchors_lvl = anchor_lib.pyramid_anchors(
        shapes, strides, cfg.MODEL.ANCHOR_GENERATOR.SIZES,
        cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
        cfg.MODEL.ANCHOR_GENERATOR.OFFSET)
    anchors_all = jnp.concatenate(anchors_lvl, axis=0)

    def labeler(step_rng, gt):
        r1, _ = jax.random.split(step_rng)
        return rpn_lib.label_and_sample_anchors(
            r1, anchors_all, gt,
            cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
            cfg.MODEL.RPN.POSITIVE_FRACTION,
            cfg.MODEL.RPN.IOU_THRESHOLDS,
            [0, -1, 1],
            cfg.MODEL.RPN.IGNORE_THRESHOLD)
    return jax.jit(labeler)


def build_model(cfg, priors: Optional[dict] = None, dtype=None):
    """Registry-driven model construction (rcnn3d.py:594-618).

    priors: dict with 'priors_dims_per_cat' as computed by
    models/priors.py:compute_priors (or None to disable priors).
    """
    from ..config.config import StaticCfg
    name = cfg.MODEL.META_ARCHITECTURE
    if name not in META_ARCH_REGISTRY:
        raise KeyError(f"Unknown meta arch {name}; known: {sorted(META_ARCH_REGISTRY)}")
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    dims_priors = z_scales = z_stats = None
    if priors is not None and cfg.MODEL.ROI_CUBE_HEAD.DIMS_PRIORS_ENABLED:
        dims_priors = np.asarray(priors["priors_dims_per_cat"], np.float32)
    if priors is not None and cfg.MODEL.ROI_CUBE_HEAD.CLUSTER_BINS > 1:
        z_scales = np.asarray(priors["priors_z_scales"], np.float32)
        z_stats = np.asarray(priors["priors_z_stats"], np.float32)
    return META_ARCH_REGISTRY[name](cfg=StaticCfg(cfg), dims_priors=dims_priors,
                                    z_scales=z_scales, z_stats=z_stats,
                                    dtype=dtype)
