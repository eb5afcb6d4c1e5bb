#!/usr/bin/env python
"""Folder inference demo — parity with the reference demo/demo.py: run the
model on a folder of images with default or user-provided intrinsics,
render 3D wireframes + a top-down view per image.

  python demo/demo.py --config-file configs/Omni_combined.yaml \
      --input-folder imgs/ --output-folder out/ \
      [--focal-length F] [--principal-point PX PY] [--threshold 0.25]

Default intrinsics follow the reference (demo.py:67-80): f = 4*h/2 NDC,
i.e. focal = 2 * image height, principal point at the centre. Precomputed
depth/ground npz maps are picked up from --depth-folder/--ground-folder
when present (demo.py:81-94).
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

logger = logging.getLogger("weakcube_tpu.demo")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--input-folder", required=True)
    p.add_argument("--output-folder", default="demo_out")
    p.add_argument("--focal-length", type=float, default=0.0)
    p.add_argument("--principal-point", type=float, nargs=2, default=None)
    p.add_argument("--threshold", type=float, default=0.25)
    p.add_argument("--depth-folder", default=None)
    p.add_argument("--ground-folder", default=None)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args(argv)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    if os.environ.get("WEAKCUBE_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["WEAKCUBE_PLATFORM"])
    args = parse_args(argv)

    import jax
    from PIL import Image

    from weakcube_tpu.config import get_cfg
    from weakcube_tpu.data.build import pad_batch
    from weakcube_tpu.data.mapper import DatasetMapper3D
    from weakcube_tpu.models.rcnn3d import build_model
    from weakcube_tpu.parallel.train_step import make_eval_step
    from weakcube_tpu.vis.vis import visualize_from_instances

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    files = sorted(sum((glob.glob(os.path.join(args.input_folder, e))
                        for e in ("*.jpg", "*.png", "*.jpeg")), []))
    if not files:
        logger.error("no images found in %s", args.input_folder)
        return
    os.makedirs(args.output_folder, exist_ok=True)

    num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    priors = {"priors_dims_per_cat": np.tile(
        np.array([[[0.8, 0.8, 0.8], [0.3, 0.3, 0.3]]], np.float32),
        (num_classes, 1, 1))}
    model = build_model(cfg, priors)
    mapper = DatasetMapper3D(cfg, is_train=False)
    eval_step = make_eval_step(model)

    variables = None
    for path in files:
        img = np.asarray(Image.open(path).convert("RGB"))
        h, w = img.shape[:2]
        f = args.focal_length or 2.0 * h  # reference default: f = 4*h/2 NDC
        px, py = args.principal_point or (w / 2, h / 2)
        K = np.array([[f, 0, px], [0, f, py], [0, 0, 1]], np.float32)
        record = {"file_name": path, "width": w, "height": h, "K": K,
                  "image_id": 0, "annotations": []}
        depth = ground = None
        stem = os.path.splitext(os.path.basename(path))[0]
        if args.depth_folder:
            dp = os.path.join(args.depth_folder, stem + ".npz")
            if os.path.exists(dp):
                depth = dict(np.load(dp)).popitem()[1]
        if args.ground_folder:
            gp = os.path.join(args.ground_folder, stem + ".npz")
            if os.path.exists(gp):
                ground = dict(np.load(gp)).popitem()[1]
        example = mapper(record, image=img, depth_map=depth, ground_map=ground)
        batch = pad_batch([example])
        if variables is None:
            variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                                   train=False)
            # load weights if configured (cubercnn:// URIs and released
            # .pth checkpoints are resolved/converted, like eval)
            if cfg.MODEL.WEIGHTS:
                from weakcube_tpu.solver.checkpoint import load_model_weights
                params, batch_stats = load_model_weights(cfg.MODEL.WEIGHTS, cfg)
                variables = {"params": params, "batch_stats": batch_stats}
        model_batch = {k: batch[k] for k in
                       ("image", "image_wh", "K", "gt", "depth_map",
                        "ground_mask", "ground_valid") if k in batch}
        det = eval_step(variables["params"], variables.get("batch_stats", {}),
                        model_batch)
        # threshold + render at network resolution
        keep = np.asarray(det.scores3D[0]) >= args.threshold
        det = det._replace(valid=det.valid & np.asarray(keep)[None, :])
        from weakcube_tpu.vis.vis import image_to_pixels
        net_img = image_to_pixels(batch["image"][0], cfg)
        out = os.path.join(args.output_folder, stem + "_3Dboxes.jpg")
        visualize_from_instances(net_img, np.asarray(batch["K"][0]),
                                 det, 0, out)
        logger.info("wrote %s (%d boxes)", out, int(keep.sum()))


if __name__ == "__main__":
    main()
