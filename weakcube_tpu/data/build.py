"""Batch builders: mapped examples -> dense device batches; samplers.

Replaces cubercnn/data/build.py: the training loader with dataset-balancing
and category repeat-factor sampling (build.py:76-203), and the batched test
loader (build.py:222-259). Host-side numpy; the resulting batch dict is what
the jitted train/eval step consumes directly.
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..structures import GroundTruth
from .mapper import DatasetMapper3D


def pad_batch(examples: List[Dict]) -> Dict:
    """Stack mapped examples into one dense batch dict (+ GroundTruth)."""
    import jax.numpy as jnp

    def stack(key):
        return jnp.asarray(np.stack([e[key] for e in examples]))

    batch = {
        "image": stack("image"),
        "image_wh": stack("image_wh"),
        "K": stack("K"),
        "gt": GroundTruth(
            boxes=stack("gt_boxes"), classes=stack("gt_classes"),
            valid=stack("gt_valid"), boxes3D=stack("gt_boxes3D"),
            poses=stack("gt_poses")),
    }
    for opt in ("depth_map", "ground_mask", "ground_mask_bits",
                "ground_normal"):
        if opt in examples[0]:
            batch[opt] = stack(opt)
    for opt in ("ground_valid", "ground_normal_valid"):
        if opt in examples[0]:
            batch[opt] = jnp.asarray(
                np.asarray([e[opt] for e in examples]))
    batch["image_id"] = np.asarray([e["image_id"] for e in examples])
    batch["scale"] = np.asarray([e["scale"] for e in examples], np.float32)
    return batch


def repeat_factors_from_category_frequency(records: Sequence[Dict],
                                           repeat_thresh: float) -> np.ndarray:
    """d2 RepeatFactorTrainingSampler factors (build.py:158-203 semantics):
    r(img) = max over its categories of max(1, sqrt(t / f(c)))."""
    from collections import Counter
    freq = Counter()
    n = len(records)
    for r in records:
        cats = {a["category_id"] for a in r.get("annotations", [])
                if not a.get("ignore", False)}
        freq.update(cats)
    cat_rep = {c: max(1.0, np.sqrt(repeat_thresh / (f / n)))
               for c, f in freq.items()}
    out = np.ones(n, np.float64)
    for i, r in enumerate(records):
        cats = {a["category_id"] for a in r.get("annotations", [])
                if not a.get("ignore", False)}
        if cats:
            out[i] = max(cat_rep.get(c, 1.0) for c in cats)
    return out


def build_train_batches(cfg, records: Sequence[Dict],
                        batch_size: Optional[int] = None,
                        seed: int = 0,
                        loaders: Optional[Dict] = None) -> Iterator[Dict]:
    """Infinite iterator of dense train batches.

    loaders: optional dict of callables {image, depth, ground}(record) ->
    numpy array, letting callers plug npz pseudo-GT artefacts or synthetic
    renderers without the mapper knowing the storage format.
    """
    mapper = DatasetMapper3D(cfg, is_train=True)
    rng = np.random.default_rng(seed)
    bs = batch_size or cfg.SOLVER.IMS_PER_BATCH
    loaders = loaders or {}

    if cfg.DATALOADER.SAMPLER_TRAIN == "RepeatFactorTrainingSampler":
        rf = repeat_factors_from_category_frequency(records,
                                                    cfg.DATALOADER.REPEAT_THRESHOLD)
        probs = rf / rf.sum()
    else:
        probs = np.full(len(records), 1.0 / len(records))

    # per-bucket accumulation (d2 AspectRatioGroupedDataset semantics,
    # reference data/build.py:76-155): a batch is emitted when one canvas
    # bucket fills, so every batch is shape-homogeneous (one compiled graph
    # per bucket). With a single bucket this degenerates to plain batching.
    pools: Dict[tuple, List[Dict]] = {}
    while True:
        idx = rng.choice(len(records), size=bs, p=probs)
        for i in idx:
            r = records[i]
            ex = mapper(
                r, rng,
                image=loaders.get("image", _default_image)(r),
                depth_map=loaders["depth"](r) if "depth" in loaders else None,
                ground_map=loaders["ground"](r) if "ground" in loaders else None)
            pool = pools.setdefault(ex["bucket"], [])
            pool.append(ex)
            if len(pool) == bs:
                yield pad_batch(pool)
                pools[ex["bucket"]] = []


def build_test_batches(cfg, records: Sequence[Dict],
                       batch_size: int = 8,
                       loaders: Optional[Dict] = None) -> Iterator[Dict]:
    """Finite iterator over the dataset (last batch per bucket padded by
    repetition; consumers dedupe by image_id). With aspect buckets, records
    are grouped by canvas shape first so each batch is shape-homogeneous."""
    mapper = DatasetMapper3D(cfg, is_train=False)
    loaders = loaders or {}

    def mapped(r):
        return mapper(r, image=loaders.get("image", _default_image)(r),
                      depth_map=loaders["depth"](r) if "depth" in loaders else None,
                      ground_map=loaders["ground"](r) if "ground" in loaders else None)

    pools: Dict[tuple, List[Dict]] = {}
    order: List[tuple] = []
    for r in records:
        ex = mapped(r)
        pool = pools.setdefault(ex["bucket"], [])
        if ex["bucket"] not in order:
            order.append(ex["bucket"])
        pool.append(ex)
        if len(pool) == batch_size:
            yield pad_batch(pool)
            pools[ex["bucket"]] = []
    for b in order:
        tail = pools.get(b) or []
        if tail:
            tail = tail + [tail[-1]] * (batch_size - len(tail))
            yield pad_batch(tail)


def _default_image(record: Dict) -> np.ndarray:
    from .datasets import read_image
    return read_image(record["file_name"], record=record)


def prefetch(iterator: Iterator[Dict], depth: int = 2) -> Iterator[Dict]:
    """Background-thread prefetch: overlap host-side decode/augment/stack
    with device compute (the reference gets this from detectron2's worker
    processes; one thread suffices here since the mapper is numpy/PIL-bound
    and the train step runs on device)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
