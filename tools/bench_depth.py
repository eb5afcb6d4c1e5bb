#!/usr/bin/env python
"""Pseudo-GT throughput: Depth Anything V2 (metric, ViT-L) batched inference
on one TPU chip — the reference runs this model per image, unbatched
(generate_depth_maps.py:85), which is the bottleneck of its offline pipeline.

Prints one JSON line (images/sec/chip). Baseline: ~13 img/s for the
unbatched reference pass on an A40 (ViT-L 518 px single-image inference).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_IMG_PER_SEC = 13.0
BATCH = int(os.environ.get("BENCH_DEPTH_BATCH", 48))  # v5e sweet spot (sweep 2026-08-20)
SIZE = 518


def main():
    import jax
    import jax.numpy as jnp
    from weakcube_tpu.data.pseudo_gt.depth_anything_v2 import DepthAnythingV2

    variant = os.environ.get("BENCH_DEPTH_VARIANT", "vitl")
    model = DepthAnythingV2(variant=variant, max_depth=20.0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(BATCH, SIZE, SIZE, 3)).astype(np.float32))

    t0 = time.perf_counter()
    params = jax.jit(lambda r: model.init(r, x))(jax.random.PRNGKey(0))["params"]
    jax.block_until_ready(params)
    print(f"# init {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    t0 = time.perf_counter()
    out = fwd(params, x)
    _ = float(out[0, 0, 0])
    print(f"# compile+first {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # rtt measurement (block_until_ready unreliable on this platform)
    tiny = jax.jit(lambda v: v + 1)
    _ = float(tiny(jnp.zeros(())))
    rtts = []
    for _ in range(8):
        t0 = time.perf_counter()
        _ = float(tiny(jnp.zeros(())))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    per = []
    for i in range(12):
        xi = x + i * 1e-6
        t0 = time.perf_counter()
        out = fwd(params, xi)
        _ = float(out[0, 0, 0])
        per.append(time.perf_counter() - t0)
    step = max(float(np.median(per)) - rtt, 1e-6)
    ips = BATCH / step
    print(f"# per-iter median {np.median(per) * 1e3:.0f}ms "
          f"(-rtt {step * 1e3:.0f}ms)", file=sys.stderr)
    print(json.dumps({
        "metric": f"depth_anything_v2_{variant}_518px",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / REF_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
