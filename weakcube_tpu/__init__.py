"""weakcube_tpu — a TPU-native (JAX / XLA / Pallas / pjit) re-design of
Weak Cube R-CNN (weakly-supervised monocular 3D object detection).

Capability parity target: AndreasLH/Weak-Cube-R-CNN (see /root/repo/SURVEY.md).
This is NOT a port: all compute-path code is idiomatic JAX — static shapes,
vmapped geometry (no per-instance Python loops), SPMD via jax.sharding.Mesh,
Pallas kernels for the hot ops, and host-side numpy only for offline eval.

Package layout:
  ops/         pure-JAX + Pallas geometry & detection ops (rotations, cuboids,
               boxes, IoU3D, ROIAlign, NMS, RANSAC plane, soft convex hull)
  models/      flax.linen modules: backbones+FPN, RPN, box/cube heads, meta-arch
  data/        Omni3D dataset layer, 3D-aware mapper, synthetic fixtures,
               pseudo-GT generation (depth / ground segmentation)
  solver/      optax optimizer builders with detectron2-style param groups
  evaluation/  Omni3D evaluator (2D + 3D AP) in numpy on host
  parallel/    device-mesh construction, sharded train/eval steps
  vis/         CPU wireframe rendering and report tables
  config/      yacs-style YAML config system (drop-in key compatibility)
"""

__version__ = "0.1.0"
