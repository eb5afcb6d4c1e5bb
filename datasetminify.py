#!/usr/bin/env python
"""Make `_mini` dataset splits for smoke tests (reference datasetminify.py):
random N images, optional category/idx filtering, preserving the Omni3D
JSON structure.

  python datasetminify.py datasets/Omni3D/SUNRGBD_train.json -n 100
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def minify(json_path: str, n_images: int = 100, seed: int = 0,
           categories=None, image_ids=None, out_path=None) -> str:
    with open(json_path) as f:
        coco = json.load(f)

    images = coco.get("images", [])
    if image_ids:
        keep = [im for im in images if im["id"] in set(image_ids)]
    else:
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(images), size=min(n_images, len(images)),
                         replace=False)
        keep = [images[i] for i in sorted(idx)]
    keep_ids = {im["id"] for im in keep}

    cats = coco.get("categories", [])
    if categories:
        cats = [c for c in cats if c["name"] in set(categories)]
    cat_ids = {c["id"] for c in cats}

    annos = [a for a in coco.get("annotations", [])
             if a["image_id"] in keep_ids and
             (not categories or a["category_id"] in cat_ids)]

    out = dict(coco)
    out["images"] = keep
    out["annotations"] = annos
    out["categories"] = cats

    if out_path is None:
        base, ext = os.path.splitext(json_path)
        out_path = base + "_mini" + ext
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"wrote {out_path}: {len(keep)} images, {len(annos)} annotations")
    return out_path


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("json_path")
    p.add_argument("-n", "--num-images", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--categories", nargs="*", default=None)
    args = p.parse_args()
    minify(args.json_path, args.num_images, args.seed, args.categories)
