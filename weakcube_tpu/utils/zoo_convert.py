"""Convert released Cube R-CNN checkpoints (detectron2 naming) into our
RCNN3D parameter tree.

The reference distributes full-model .pth files via the cubercnn:// zoo
(util/model_zoo.py, MODEL_ZOO.md). This maps their state_dict onto the flax
modules so SURVEY §7.3 M2 (eval parity with converted DLA34/ResNet34
weights) is a one-command task once the files are present.

Covered submodules and their d2-side names:
  backbone.bottom_up.*          DLA trunk (base_layer, level0..5 trees) or
                                torchvision ResNet (stem + layerN)
  backbone.fpn_lateral{2..6} / fpn_output{2..6}
  proposal_generator.rpn_head.{conv, objectness_logits, anchor_deltas}
  roi_heads.box_head.{fc1,fc2}; roi_heads.box_predictor.{cls_score,bbox_pred}
  roi_heads.cube_head.feature_generator.fc{1,2} (or per-branch generators)
                      bbox_3D_{center_deltas,dims,pose,center_depth,uncertainty}

Returns (params, batch_stats) trees matching models/rcnn3d.RCNN3D*.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .torch_convert import convert_torchvision_resnet


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _dense(sd, name):
    return {"kernel": sd[name + ".weight"].T, "bias": sd[name + ".bias"]}


def _convb(sd, name):
    out = {"kernel": _conv(sd[name + ".weight"])}
    if name + ".bias" in sd:
        out["bias"] = sd[name + ".bias"]
    return out


def _bn(sd, name):
    return ({"scale": sd[name + ".weight"], "bias": sd[name + ".bias"]},
            {"mean": sd[name + ".running_mean"], "var": sd[name + ".running_var"]})


def _dla_block(sd, prefix):
    """DLA BasicBlock: conv1/bn1/conv2/bn2 (reference dla.py:40-90)."""
    p, s = {}, {}
    for ci in (1, 2):
        p[f"conv{ci}"] = _convb(sd, f"{prefix}.conv{ci}")
        p[f"bn{ci}"], s[f"bn{ci}"] = _bn(sd, f"{prefix}.bn{ci}")
    return p, s


def _dla_tree(sd, prefix, levels):
    """Recursive Tree (dla.py:177-232): tree1/tree2 + root + project."""
    p, s = {}, {}
    if levels == 1:
        p["tree1"], s["tree1"] = _dla_block(sd, prefix + ".tree1")
        p["tree2"], s["tree2"] = _dla_block(sd, prefix + ".tree2")
    else:
        p["tree1"], s["tree1"] = _dla_tree(sd, prefix + ".tree1", levels - 1)
        p["tree2"], s["tree2"] = _dla_tree(sd, prefix + ".tree2", levels - 1)
    if prefix + ".root.conv.weight" in sd:
        root_p = {"conv": _convb(sd, prefix + ".root.conv")}
        bn_p, bn_s = _bn(sd, prefix + ".root.bn")
        root_p["bn"] = bn_p
        p["root"] = root_p
        s["root"] = {"bn": bn_s}
    if prefix + ".project.0.weight" in sd:
        p["project_conv"] = _convb(sd, prefix + ".project.0")
        p["project_bn"], s["project_bn"] = _bn(sd, prefix + ".project.1")
    return p, s


def convert_dla_bottom_up(sd: Dict[str, np.ndarray], dla_type: str = "dla34",
                          prefix: str = "backbone.bottom_up."):
    from ..models.backbone.dla import _DLA_SPECS
    levels, channels, _ = _DLA_SPECS[dla_type]
    p: Dict = {}
    s: Dict = {}
    p["base_conv"] = _convb(sd, prefix + "base_layer.0")
    p["base_bn"], s["base_bn"] = _bn(sd, prefix + "base_layer.1")
    for li in (0, 1):
        p[f"level{li}_conv"] = _convb(sd, f"{prefix}level{li}.0")
        p[f"level{li}_bn"], s[f"level{li}_bn"] = _bn(sd, f"{prefix}level{li}.1")
    for li in (2, 3, 4, 5):
        p[f"level{li}"], s[f"level{li}"] = _dla_tree(
            sd, f"{prefix}level{li}", levels[li])
    return p, s


def convert_fpn(sd: Dict[str, np.ndarray], in_features=("p2", "p3", "p4", "p5", "p6"),
                prefix: str = "backbone."):
    p: Dict = {}
    for i, name in enumerate(in_features):
        lvl = i + 2
        p[f"lateral_{name}"] = _convb(sd, f"{prefix}fpn_lateral{lvl}")
        p[f"output_{name}"] = _convb(sd, f"{prefix}fpn_output{lvl}")
    return p


def convert_rpn_head(sd: Dict[str, np.ndarray],
                     prefix: str = "proposal_generator.rpn_head."):
    return {
        "conv": _convb(sd, prefix + "conv"),
        "objectness": _convb(sd, prefix + "objectness_logits"),
        "deltas": _convb(sd, prefix + "anchor_deltas"),
    }


def convert_roi_heads(sd: Dict[str, np.ndarray], shared_fc: bool = True,
                      prefix: str = "roi_heads."):
    p: Dict = {"box_head": {}, "box_predictor": {}, "cube_head": {}}
    p["box_head"]["fc1"] = _dense(sd, prefix + "box_head.fc1")
    p["box_head"]["fc2"] = _dense(sd, prefix + "box_head.fc2")
    p["box_predictor"]["cls_score"] = _dense(sd, prefix + "box_predictor.cls_score")
    p["box_predictor"]["bbox_pred"] = _dense(sd, prefix + "box_predictor.bbox_pred")

    ch = p["cube_head"]
    cp = prefix + "cube_head."
    if shared_fc:
        ch["shared_fc1"] = _dense(sd, cp + "feature_generator.fc1")
        ch["shared_fc2"] = _dense(sd, cp + "feature_generator.fc2")
    else:
        for branch, ours in (("XY", "xy"), ("dims", "dims"), ("pose", "pose"),
                             ("Z", "z"), ("conf", "conf")):
            key = cp + f"feature_generator_{branch}.fc1"
            if key + ".weight" in sd:
                ch[f"{ours}_fc1"] = _dense(sd, cp + f"feature_generator_{branch}.fc1")
                ch[f"{ours}_fc2"] = _dense(sd, cp + f"feature_generator_{branch}.fc2")
    ch["bbox_3D_center_deltas"] = _dense(sd, cp + "bbox_3D_center_deltas")
    ch["bbox_3D_dims"] = _dense(sd, cp + "bbox_3D_dims")
    ch["bbox_3D_pose"] = _dense(sd, cp + "bbox_3D_pose")
    ch["bbox_3D_center_depth"] = _dense(sd, cp + "bbox_3D_center_depth")
    if cp + "bbox_3D_uncertainty.weight" in sd:
        ch["bbox_3D_uncertainty"] = _dense(sd, cp + "bbox_3D_uncertainty")
    return p


def convert_zoo_checkpoint(sd: Dict[str, np.ndarray], cfg) -> Tuple[Dict, Dict]:
    """Full RCNN3D state_dict -> (params, batch_stats)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    backbone_name = cfg.MODEL.BACKBONE.NAME
    if "dla" in backbone_name:
        bu_p, bu_s = convert_dla_bottom_up(sd, cfg.MODEL.DLA.TYPE)
    elif "resnet" in backbone_name:
        # torchvision-style trunk lives under backbone.bottom_up.
        sub = {k[len("backbone.bottom_up."):]: v for k, v in sd.items()
               if k.startswith("backbone.bottom_up.")}
        bu_p, bu_s = convert_torchvision_resnet(sub, cfg.MODEL.RESNETS.DEPTH)
    else:
        raise ValueError(f"unsupported backbone for zoo conversion: {backbone_name}")
    params["bottom_up"] = bu_p
    stats["bottom_up"] = bu_s
    params["backbone"] = {"fpn": convert_fpn(sd, tuple(cfg.MODEL.FPN.IN_FEATURES))}
    params["rpn_head"] = convert_rpn_head(sd)
    params["roi_heads"] = convert_roi_heads(
        sd, shared_fc=cfg.MODEL.ROI_CUBE_HEAD.SHARED_FC)
    return params, stats


def convert_dla_imagenet(sd: Dict[str, np.ndarray], dla_type: str = "dla34"):
    """ImageNet-pretrained DLA trunk (the reference's dla34 pretrained
    weights use bare `base_layer./level0.` naming, dla.py:312-415):
    -> (params, batch_stats) for models.backbone.dla.DLABottomUp."""
    return convert_dla_bottom_up(sd, dla_type, prefix="")
