#!/usr/bin/env python
"""Generate ground-segmentation pseudo-GT artefacts.

Reference: cubercnn/data/generate_ground_segmentations.py — GroundingDINO
("ground" text prompt, box 0.35 / text 0.25 thresholds) -> max-logit box ->
SAM-HQ mask; masks under 1000 px -> no-ground list; writes
datasets/ground_maps/{image_id}.npz + datasets/no_ground_idx.csv.

Methods here:
  * --method depth-ransac (default, TPU-native): fit the dominant
    up-facing plane in the depth-map point cloud (ops.plane RANSAC, batched
    over the mesh) and mark its inliers as ground. Requires depth maps
    (run generate_depth_maps first). Produces the same artefact format.
  * --method foundation: GroundingDINO + SAM JAX graphs (architectures in
    pseudo_gt/, pipeline in foundation_ground_mask()); pass the released
    .pth checkpoints via --gdino-ckpt/--sam-ckpt — converted on the fly
    (this sealed environment cannot fetch them; pre-place the files).
"""
from __future__ import annotations

import argparse
import csv
import os
from typing import Dict, Sequence

import numpy as np

MIN_MASK_PX = 1000  # reference threshold (:193-199)


def ground_from_depth_ransac(depth: np.ndarray, K: np.ndarray,
                             key, use_nth: int = 4,
                             thresh: float = 0.08) -> np.ndarray:
    """Ground mask = inliers of the best up-facing RANSAC plane."""
    import jax
    import jax.numpy as jnp
    from ..ops import plane as plane_ops

    H, W = depth.shape
    z = depth[::use_nth, ::use_nth]
    h, w = z.shape
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    fx, fy = K[0, 0] / use_nth, K[1, 1] / use_nth
    x = (u - w / 2) * z / max(fx, 1e-6)
    y = (v - h / 2) * z / max(fy, 1e-6)
    pts = jnp.asarray(np.stack([x, y, z], -1).reshape(-1, 3), jnp.float32)
    # bias sampling toward the lower half of the image (where ground lives)
    lower = jnp.asarray((v >= h * 0.4).reshape(-1))
    eq, inl = plane_ops.ransac_plane(key, pts, valid=lower, thresh=thresh)
    n = np.asarray(eq[:3])
    # accept only roughly up-facing planes
    if abs(n[1]) < max(abs(n[0]), abs(n[2])):
        return np.zeros((H, W), bool)
    mask_small = np.asarray(inl).reshape(h, w)
    # upsample
    mask = np.zeros((H, W), bool)
    mask[::1, ::1] = np.kron(mask_small, np.ones((use_nth, use_nth), bool))[:H, :W]
    return mask


def _default_image_loader(record):
    from PIL import Image
    return np.asarray(Image.open(record["file_name"]).convert("RGB"))


def generate(records: Sequence[Dict], out_dir: str, depth_dir: str,
             method: str = "depth-ransac", artifacts_root: str = "datasets",
             depth_loader=None, foundation_models=None, image_loader=None,
             box_threshold: float = None, gdino_side: int = 768) -> None:
    """foundation_models: (gdino, gdino_params, sam, sam_params) — required
    for --method foundation (see load_foundation_models)."""
    import jax
    os.makedirs(out_dir, exist_ok=True)
    no_ground = []
    key = jax.random.PRNGKey(0)
    if method == "foundation":
        if foundation_models is None:
            raise ValueError(
                "foundation method needs converted GroundingDINO/SAM "
                "checkpoints: pass --gdino-ckpt/--sam-ckpt (reference "
                "generate_ground_segmentations.py:137-191)")
        gdino, gdino_params, sam, sam_params = foundation_models
        image_loader = image_loader or _default_image_loader
    for i, r in enumerate(records):
        if method == "foundation":
            image = image_loader(r)
            mask = foundation_ground_mask(
                gdino, gdino_params, sam, sam_params, image,
                box_threshold=(BOX_THRESHOLD if box_threshold is None
                               else box_threshold),
                gdino_side=gdino_side)
        else:
            if depth_loader is not None:
                depth = depth_loader(r)
            else:
                dp = os.path.join(depth_dir, f"{r['image_id']}.npz")
                if not os.path.exists(dp):
                    no_ground.append(r["image_id"])
                    continue
                with np.load(dp) as zf:
                    depth = zf[list(zf.keys())[0]].astype(np.float32)
            mask = ground_from_depth_ransac(
                depth, np.asarray(r["K"], np.float32), jax.random.fold_in(key, i))
        if mask.sum() < MIN_MASK_PX:
            no_ground.append(r["image_id"])
            continue
        np.savez_compressed(os.path.join(out_dir, f"{r['image_id']}.npz"),
                            ground=mask)
    with open(os.path.join(artifacts_root, "no_ground_idx.csv"), "a") as f:
        w = csv.writer(f)
        for iid in no_ground:
            w.writerow([iid])
    print(f"wrote {len(records) - len(no_ground)} ground maps, "
          f"{len(no_ground)} no-ground ids")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="configs/Omni_combined.yaml")
    p.add_argument("--method", default="depth-ransac",
                   choices=["depth-ransac", "foundation"])
    p.add_argument("--depth-dir", default="datasets/depth_maps")
    p.add_argument("--out", default="datasets/ground_maps")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--gdino-ckpt", default=None,
                   help="groundingdino_swint_ogc.pth (foundation method)")
    p.add_argument("--sam-ckpt", default=None,
                   help="sam_hq_vit_*.pth (foundation method)")
    p.add_argument("--sam-variant", default="vit_l",
                   choices=["vit_b", "vit_l", "vit_h"])
    args = p.parse_args(argv)

    foundation_models = None
    if args.method == "foundation":
        if not (args.gdino_ckpt and args.sam_ckpt):
            p.error("--method foundation requires --gdino-ckpt and --sam-ckpt")
        foundation_models = load_foundation_models(
            args.gdino_ckpt, args.sam_ckpt, args.sam_variant)

    if args.synthetic:
        from . import synthetic
        records = synthetic.make_dataset(args.synthetic)
        loader = lambda r: synthetic.render_depth(r["_scene"])
        generate(records, args.out, args.depth_dir, args.method,
                 depth_loader=loader,
                 foundation_models=foundation_models,
                 image_loader=lambda r: synthetic.render_image(r["_scene"]))
        return
    from weakcube_tpu.config import get_cfg
    from . import datasets as ds
    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    fs = ds.get_filter_settings_from_cfg(cfg)
    records = []
    for name in list(cfg.DATASETS.TRAIN) + list(cfg.DATASETS.TEST):
        if name not in ds.DATASET_CATALOG:
            ds.simple_register(name, fs)
        records.extend(ds.DATASET_CATALOG[name]())
    generate(records, args.out, args.depth_dir, args.method,
             foundation_models=foundation_models)


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# foundation-model path (GroundingDINO "ground" boxes -> SAM mask)
# ---------------------------------------------------------------------------

# bert-base-uncased wordpiece ids for the fixed prompt "ground." used by the
# reference (TEXT_PROMPT="ground", generate_ground_segmentations.py:137)
GROUND_PROMPT_TOKENS = [101, 2598, 1012, 102]  # [CLS] ground . [SEP]
BOX_THRESHOLD = 0.35   # reference thresholds (:157-164)
TEXT_THRESHOLD = 0.25


def load_foundation_models(gdino_ckpt: str, sam_ckpt: str,
                           sam_variant: str = "vit_l"):
    """Released .pth checkpoints -> (gdino, gdino_params, sam, sam_params).
    groundingdino_swint_ogc.pth + sam_hq_vit_*.pth, converted on the fly
    (reference generate_ground_segmentations.py:24-43 model setup)."""
    from .pseudo_gt import grounding_dino as gd
    from .pseudo_gt import sam as sam_mod
    from ..utils.torch_convert import load_pth

    gdino = gd.GroundingDINO()
    gdino_params = gd.convert_torch_checkpoint(load_pth(gdino_ckpt))
    sam = sam_mod.Sam(variant=sam_variant, hq=True)
    sam_params = sam_mod.convert_torch_checkpoint(
        load_pth(sam_ckpt), variant=sam_variant, hq=True)
    return gdino, gdino_params, sam, sam_params


def foundation_ground_mask(gdino, gdino_params, sam, sam_params,
                           image: np.ndarray,
                           box_threshold: float = BOX_THRESHOLD,
                           gdino_side: int = 768) -> np.ndarray:
    """One image through GroundingDINO("ground") -> max-logit box -> SAM.

    Mirrors the reference pipeline (:137-191): take the highest-scoring
    grounded box above box_threshold, prompt SAM with it, return the mask
    at the original resolution (empty mask when no box clears threshold).
    """
    import jax
    import jax.numpy as jnp
    from .pseudo_gt.grounding_dino import predict_ground_boxes
    from .pseudo_gt.sam import IMG_SIZE, preprocess_sam

    H, W = image.shape[:2]
    # GroundingDINO input: 800-ish normalised; we use a fixed square
    from PIL import Image
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    side = gdino_side
    g_in = np.asarray(Image.fromarray(image.astype(np.uint8))
                      .resize((side, side), Image.BILINEAR), np.float32) / 255.0
    g_in = ((g_in - mean) / std)[None]
    tokens = jnp.asarray([GROUND_PROMPT_TOKENS + [0] * 12])
    tmask = tokens > 0
    boxes, scores = predict_ground_boxes(gdino, gdino_params,
                                         jnp.asarray(g_in), tokens, tmask)
    best = int(jnp.argmax(scores[0]))
    if float(scores[0, best]) < box_threshold:
        return np.zeros((H, W), bool)
    cx, cy, bw, bh = np.asarray(boxes[0, best])
    # cxcywh normalised -> XYXY in SAM 1024-space (scaled by longest side)
    s = IMG_SIZE / max(H, W)
    box_xyxy = np.array([(cx - bw / 2) * W * s, (cy - bh / 2) * H * s,
                         (cx + bw / 2) * W * s, (cy + bh / 2) * H * s],
                        np.float32)
    sam_in = preprocess_sam([image])
    masks = sam.apply({"params": sam_params}, jnp.asarray(sam_in),
                      jnp.asarray(box_xyxy)[None, None])
    m = np.asarray(masks[0, 0]) > 0  # (256, 256) logits
    big = np.asarray(Image.fromarray(m.astype(np.uint8) * 255).resize(
        (W, H), Image.NEAREST)) > 127
    return big
