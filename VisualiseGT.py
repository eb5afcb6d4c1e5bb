#!/usr/bin/env python
"""Dataset statistics and results analysis (reference VisualiseGT.py):
per-category annotation counts, dimension/depth distributions, AP-vs-class
plots, and parsing metrics back out of training logs.

  python VisualiseGT.py --synthetic 64                   # dataset stats
  python VisualiseGT.py --log output/*/log.txt --metric AP3D
"""
from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter, defaultdict

import numpy as np


def dataset_statistics(records, class_names=None):
    """Per-category counts + dims/z distributions; returns a dict and
    prints a table."""
    counts = Counter()
    dims = defaultdict(list)
    zs = defaultdict(list)
    for r in records:
        for a in r.get("annotations", []):
            if a.get("ignore", False):
                continue
            c = a["category_id"]
            counts[c] += 1
            dims[c].append(a["dimensions"])
            zs[c].append(a["center_cam"][2])
    print(f"{'category':>16s} {'count':>7s} {'z_mean':>7s} "
          f"{'w':>6s} {'h':>6s} {'l':>6s}")
    stats = {}
    for c in sorted(counts):
        d = np.asarray(dims[c])
        z = np.asarray(zs[c])
        name = class_names[c] if class_names and c < len(class_names) else str(c)
        print(f"{name:>16s} {counts[c]:7d} {z.mean():7.2f} "
              f"{d[:, 0].mean():6.2f} {d[:, 1].mean():6.2f} {d[:, 2].mean():6.2f}")
        stats[c] = {"count": counts[c], "z_mean": float(z.mean()),
                    "dims_mean": d.mean(0).tolist()}
    return stats


def search_file_backwards(path: str, pattern: str):
    """Find the last occurrence of a metric in a log file (reference
    VisualiseGT.py:382 `search_file_backwards`)."""
    rx = re.compile(pattern)
    hit = None
    with open(path) as f:
        for line in f:
            m = rx.search(line)
            if m:
                hit = m
    return hit


def parse_metrics_from_log(path: str, metrics=("AP2D", "AP3D")):
    out = {}
    for m in metrics:
        hit = search_file_backwards(path, rf"{re.escape(m)}\s*[|:=]\s*([0-9.]+)")
        if hit:
            out[m] = float(hit.group(1))
    return out


def plot_ap_vs_class(per_class: dict, class_names=None, out_path="ap_vs_class.png"):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping plot")
        return
    cats = sorted(per_class)
    vals = [per_class[c] for c in cats]
    names = [class_names[c] if class_names and c < len(class_names) else str(c)
             for c in cats]
    plt.figure(figsize=(max(6, len(cats) * 0.4), 4))
    plt.bar(names, vals)
    plt.ylabel("AP")
    plt.xticks(rotation=90)
    plt.tight_layout()
    plt.savefig(out_path, dpi=120)
    print(f"wrote {out_path}")


def main(argv=None):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--config-file", default=None)
    p.add_argument("--log", default=None)
    p.add_argument("--metric", nargs="*", default=["AP2D", "AP3D"])
    args = p.parse_args(argv)

    if args.log:
        print(parse_metrics_from_log(args.log, args.metric))
        return
    if args.synthetic:
        from weakcube_tpu.data import synthetic
        records = synthetic.make_dataset(args.synthetic)
        dataset_statistics(records, synthetic.CATEGORIES)
        return
    if args.config_file:
        from weakcube_tpu.config import get_cfg
        from weakcube_tpu.data import datasets as ds
        cfg = get_cfg()
        cfg.merge_from_file(args.config_file)
        fs = ds.get_filter_settings_from_cfg(cfg)
        records = []
        for name in cfg.DATASETS.TRAIN:
            if name not in ds.DATASET_CATALOG:
                ds.simple_register(name, fs)
            records.extend(ds.DATASET_CATALOG[name]())
        dataset_statistics(records, list(cfg.DATASETS.CATEGORY_NAMES))
        return
    p.print_help()


if __name__ == "__main__":
    main()
