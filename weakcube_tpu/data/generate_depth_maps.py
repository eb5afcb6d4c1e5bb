#!/usr/bin/env python
"""Generate metric depth-map pseudo-GT artefacts on TPU.

Reference: cubercnn/data/generate_depth_maps.py — DepthAnythingV2
`infer_image` per image, UNBATCHED (:85), writing
datasets/depth_maps/{image_id}.npz. Here the model is a jitted batched
forward over the device mesh: decode/resize/normalise on host (overlapped),
one (B, 518, 518, 3) tensor per step. This is where the >= 5x
images/sec/chip target is won (SURVEY §7.1 step 7).

  python -m weakcube_tpu.data.generate_depth_maps \
      --checkpoint depth_anything_v2_metric_hypersim_vitl.npz \
      --config-file configs/Omni_combined.yaml --out datasets/depth_maps
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Dict, Iterable, Sequence

import numpy as np


def depth_of_images(model, params, images: np.ndarray, batch_size: int = 48):
    """Batched jitted inference: (N, H, W, 3) -> (N, H, W) metric depth."""
    import jax

    @jax.jit
    def fwd(params, x):
        return model.apply({"params": params}, x)

    outs = []
    n = len(images)
    for s in range(0, n, batch_size):
        chunk = images[s:s + batch_size]
        if len(chunk) < batch_size:  # pad to the static batch
            pad = np.repeat(chunk[-1:], batch_size - len(chunk), 0)
            full = np.concatenate([chunk, pad])
            outs.append(np.asarray(fwd(params, full))[:len(chunk)])
        else:
            outs.append(np.asarray(fwd(params, chunk)))
    return np.concatenate(outs)


def generate(records: Sequence[Dict], out_dir: str, checkpoint: str | None,
             variant: str = "vitl", max_depth: float = 20.0,
             batch_size: int = 48, input_size: int = 518,
             image_loader=None) -> None:
    import jax
    from .datasets import read_image
    from .pseudo_gt.depth_anything_v2 import (DepthAnythingV2,
                                              convert_torch_checkpoint,
                                              preprocess_images)

    os.makedirs(out_dir, exist_ok=True)
    model = DepthAnythingV2(variant=variant, max_depth=max_depth)
    if checkpoint and checkpoint.endswith(".npz"):
        params = dict(np.load(checkpoint, allow_pickle=True))["params"].item()
    elif checkpoint:  # torch .pth -> convert
        import torch
        sd = torch.load(checkpoint, map_location="cpu")
        sd = {k: v.numpy() for k, v in sd.items()}
        params = convert_torch_checkpoint(sd, variant)
    else:
        dummy = np.zeros((1, input_size, input_size, 3), np.float32)
        params = model.init(jax.random.PRNGKey(0), dummy)["params"]
        print("WARNING: no checkpoint given; using random weights (smoke mode)")

    load = image_loader or (lambda r: read_image(r["file_name"], record=r))
    t0 = time.time()
    n_done = 0
    for s in range(0, len(records), batch_size):
        chunk = records[s:s + batch_size]
        raw = [load(r) for r in chunk]
        batch = preprocess_images(raw, input_size)
        depth = depth_of_images(model, params, batch, batch_size)
        for r, d, img in zip(chunk, depth, raw):
            # resize back to the original resolution (nearest, like the
            # artefact consumers expect) and save
            from PIL import Image
            dd = np.asarray(Image.fromarray(d.astype(np.float32), "F").resize(
                (r["width"], r["height"]), Image.BILINEAR))
            np.savez_compressed(os.path.join(out_dir, f"{r['image_id']}.npz"),
                                depth=dd.astype(np.float16))
            n_done += 1
        if s % (10 * batch_size) == 0:
            dt = time.time() - t0
            print(f"{n_done}/{len(records)} depth maps "
                  f"({n_done / max(dt, 1e-9):.2f} img/s)")
    print(f"done: {n_done} maps in {time.time() - t0:.1f}s")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="configs/Omni_combined.yaml")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--variant", default="vitl", choices=["vits", "vitb", "vitl"])
    p.add_argument("--max-depth", type=float, default=20.0)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--out", default="datasets/depth_maps")
    p.add_argument("--synthetic", type=int, default=0)
    args = p.parse_args(argv)

    if args.synthetic:
        from . import synthetic
        records = synthetic.make_dataset(args.synthetic)
        loader = lambda r: synthetic.render_image(r["_scene"])
    else:
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
        loader = None
    generate(records, args.out, args.checkpoint, args.variant, args.max_depth,
             args.batch_size, image_loader=loader)


if __name__ == "__main__":
    main()
