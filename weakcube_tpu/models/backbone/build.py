"""Backbone registry + builder, keyed by the reference's registry names so
configs carry over (cfg.MODEL.BACKBONE.NAME, e.g.
'build_dla_from_vision_fpn_backbone' — reference dla.py:484, resnet.py:66).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .dla import DLABottomUp
from .fpn import FPN
from .resnet import ResNetBottomUp

BACKBONE_REGISTRY: Dict[str, Callable] = {}


def register_backbone(name: str):
    def deco(fn):
        BACKBONE_REGISTRY[name] = fn
        return fn
    return deco


class Backbone(nn.Module):
    """Bottom-up trunk + FPN -> {p2..p6} at uniform FPN channels."""

    bottom_up: nn.Module
    in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5", "p6")
    out_channels: int = 256
    fuse_type: str = "sum"
    dtype: Any = jnp.float32

    # strides of the emitted pyramid w.r.t. the input image
    STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        raw = self.bottom_up(images, train=train)
        return FPN(self.in_features, self.out_channels, self.fuse_type,
                   self.dtype, name="fpn")(raw)


@register_backbone("build_resnet_from_vision_fpn_backbone")
def _build_resnet(cfg, dtype) -> Backbone:
    bu = ResNetBottomUp(depth=cfg.MODEL.RESNETS.DEPTH, dtype=dtype, name="bottom_up")
    return Backbone(bu, tuple(cfg.MODEL.FPN.IN_FEATURES),
                    cfg.MODEL.FPN.OUT_CHANNELS, cfg.MODEL.FPN.FUSE_TYPE, dtype)


@register_backbone("build_dla_from_vision_fpn_backbone")
def _build_dla(cfg, dtype) -> Backbone:
    bu = DLABottomUp(dla_type=cfg.MODEL.DLA.TYPE, dtype=dtype, name="bottom_up")
    return Backbone(bu, tuple(cfg.MODEL.FPN.IN_FEATURES),
                    cfg.MODEL.FPN.OUT_CHANNELS, cfg.MODEL.FPN.FUSE_TYPE, dtype)


@register_backbone("build_shufflenet_fpn_backbone")
def _build_shufflenet(cfg, dtype) -> Backbone:
    from .small_nets import ShuffleNetV2BottomUp
    bu = ShuffleNetV2BottomUp(dtype=dtype, name="bottom_up")
    return Backbone(bu, tuple(cfg.MODEL.FPN.IN_FEATURES),
                    cfg.MODEL.FPN.OUT_CHANNELS, cfg.MODEL.FPN.FUSE_TYPE, dtype)


@register_backbone("build_mnasnet_fpn_backbone")
def _build_mnasnet(cfg, dtype) -> Backbone:
    from .small_nets import MNASNetBottomUp
    bu = MNASNetBottomUp(dtype=dtype, name="bottom_up")
    return Backbone(bu, tuple(cfg.MODEL.FPN.IN_FEATURES),
                    cfg.MODEL.FPN.OUT_CHANNELS, cfg.MODEL.FPN.FUSE_TYPE, dtype)


@register_backbone("build_densenet_fpn_backbone")
def _build_densenet(cfg, dtype) -> Backbone:
    from .small_nets import DenseNetBottomUp
    bu = DenseNetBottomUp(dtype=dtype, name="bottom_up")
    return Backbone(bu, tuple(cfg.MODEL.FPN.IN_FEATURES),
                    cfg.MODEL.FPN.OUT_CHANNELS, cfg.MODEL.FPN.FUSE_TYPE, dtype)


def build_backbone(cfg, dtype=jnp.float32) -> Backbone:
    name = cfg.MODEL.BACKBONE.NAME
    if name not in BACKBONE_REGISTRY:
        raise KeyError(f"Unknown backbone {name}; known: {sorted(BACKBONE_REGISTRY)}")
    return BACKBONE_REGISTRY[name](cfg, dtype)
