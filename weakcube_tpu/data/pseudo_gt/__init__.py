"""Pseudo-ground-truth generation on TPU.

The reference runs three frozen foundation models OFFLINE to fabricate
supervision (SURVEY §2.2, §3.4): Depth Anything V2 (metric depth),
GroundingDINO (text-prompted ground boxes) and SAM-HQ (masks), one image at
a time on GPU. Here each model is a JAX/flax graph batched over the device
mesh; the artefact format (datasets/depth_maps/{id}.npz,
ground_maps/{id}.npz, no_ground_idx.csv) is unchanged so the data layer is
oblivious.
"""
from .depth_anything_v2 import DepthAnythingV2, convert_torch_checkpoint  # noqa: F401
