"""Convert torchvision/zoo PyTorch checkpoints into our flax param trees.

The reference initialises backbones from torchvision pretrained weights
(resnet.py:17-27) and loads released Cube R-CNN zoo .pth checkpoints. This
module provides the mechanical mapping (torch OIHW conv -> flax HWIO,
Linear transpose, BatchNorm stats into batch_stats).

All functions accept a {name: numpy array} state_dict, so torch is only
needed by the caller that reads the .pth.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _bn(sd, prefix) -> Tuple[Dict, Dict]:
    params = {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}
    stats = {"mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"]}
    return params, stats


def convert_torchvision_resnet(sd: Dict[str, np.ndarray], depth: int):
    """torchvision resnet{18,34,50,101} state_dict -> (params, batch_stats)
    for models.backbone.resnet.ResNetBottomUp."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")

    counts = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3),
              50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    bottleneck = depth >= 50

    for stage, n in enumerate(counts):
        for b in range(n):
            src = f"layer{stage + 1}.{b}"
            dst = f"layer{stage + 1}_{b}"
            blk: Dict = {}
            bs: Dict = {}
            n_convs = 3 if bottleneck else 2
            for ci in range(1, n_convs + 1):
                blk[f"conv{ci}"] = {"kernel": _conv(sd[f"{src}.conv{ci}.weight"])}
                blk[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                blk["downsample_conv"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])}
                blk["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{src}.downsample.1")
            params[dst] = blk
            stats[dst] = bs
    return params, stats


def torch_state_dict_to_numpy(module_or_sd) -> Dict[str, np.ndarray]:
    """torch nn.Module or state_dict -> numpy dict (host-side)."""
    if hasattr(module_or_sd, "state_dict"):
        module_or_sd = module_or_sd.state_dict()
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in module_or_sd.items()}


def load_pth(path: str) -> Dict[str, np.ndarray]:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]  # detectron2 checkpoint wrapper
    return torch_state_dict_to_numpy(obj)
