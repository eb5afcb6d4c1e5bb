#!/usr/bin/env python
"""Prune degenerate ground maps (reference cubercnn/data/filter_ground.py):
maps with < 100 nonzero pixels at stride 5 are removed and their ids
appended to no_ground_idx.csv."""
from __future__ import annotations

import argparse
import csv
import os

import numpy as np


def filter_ground(ground_dir: str = "datasets/ground_maps",
                  csv_path: str = "datasets/no_ground_idx.csv",
                  min_nnz: int = 100, stride: int = 5) -> int:
    removed = []
    for fname in sorted(os.listdir(ground_dir)):
        if not fname.endswith(".npz"):
            continue
        path = os.path.join(ground_dir, fname)
        with np.load(path) as z:
            m = z[list(z.keys())[0]]
        if np.count_nonzero(m[::stride, ::stride]) < min_nnz:
            os.remove(path)
            stem = fname.split(".")[0]
            if stem.isdigit():
                removed.append(int(stem))
    if removed:
        os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
        with open(csv_path, "a") as f:
            w = csv.writer(f)
            for iid in removed:
                w.writerow([iid])
    print(f"removed {len(removed)} degenerate ground maps")
    return len(removed)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--ground-dir", default="datasets/ground_maps")
    p.add_argument("--csv", default="datasets/no_ground_idx.csv")
    args = p.parse_args()
    filter_ground(args.ground_dir, args.csv)
