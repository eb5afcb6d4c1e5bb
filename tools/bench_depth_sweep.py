#!/usr/bin/env python
"""Sweep DAv2-vitl 518px pseudo-GT depth configs on the real TPU chip.

Round-3 target: >=65 img/s/chip (5x the A40's ~13 img/s unbatched loop,
reference generate_depth_maps.py:82-86). Round-2 shipped 48.8 img/s
(B16, pad-once). Suspects from VERDICT r3 item 1: batch too small, padded
dense rows, f32 residual stream, DPT-head resizes.

Usage: python tools/bench_depth_sweep.py [--quick]
Each config = one fresh jit compile (~40 s on the warmed worker) + timed
iters; prints img/s per config plus an encoder/head split for the best.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def measure(fn, rtt, iters=8):
    per = []
    for i in range(iters):
        t0 = time.perf_counter()
        _ = float(fn(i))
        per.append(time.perf_counter() - t0)
    return max(float(np.median(per)) - rtt, 1e-6)


def main():
    import jax
    import jax.numpy as jnp
    from weakcube_tpu.data.pseudo_gt.depth_anything_v2 import (
        DepthAnythingV2, DINOv2)

    from bench import _measure_rtt
    rtt = _measure_rtt()

    SIZE = 518
    quick = "--quick" in sys.argv
    # round-1 sweep (2026-08-20, after the bf16-residual fix): B16 attn 57.4,
    # B16 once 59.7, B32 attn 53.5, B32 once 55.7, B48 attn 63.0, B64 attn
    # 63.1 img/s; encoder-only B64 875 ms -> head 139 ms (13.7%). pad-once
    # wins at equal batch; batch helps monotonically.
    configs = [
        ("B48 pad-once", 48, "once"),
        ("B64 pad-once", 64, "once"),
        ("B96 pad-once", 96, "once"),
    ]
    if not quick:
        configs += [
            ("B128 pad-once", 128, "once"),
        ]

    rng = np.random.default_rng(0)
    results = {}
    for name, B, pad_mode in configs:
        model = DepthAnythingV2(variant="vitl", max_depth=20.0,
                                pad_mode=pad_mode)
        x = jnp.asarray(rng.normal(size=(B, SIZE, SIZE, 3)).astype(np.float32))
        t0 = time.perf_counter()
        try:
            params = jax.jit(lambda r: model.init(r, x))(
                jax.random.PRNGKey(0))["params"]
            fwd = jax.jit(lambda p, xi: model.apply({"params": p}, xi)[0, 0, 0])
            _ = float(fwd(params, x))
        except Exception as e:
            print(f"{name}: FAILED {e!r}", flush=True)
            continue
        compile_s = time.perf_counter() - t0
        sec = measure(lambda i: fwd(params, x + i * 1e-6), rtt)
        ips = B / sec
        results[name] = ips
        print(f"{name}: {sec * 1e3:7.1f} ms  {ips:6.2f} img/s "
              f"(compile {compile_s:.0f}s)", flush=True)
        del params, fwd

    # encoder vs head split at the best batch/pad of the sweep
    best = max(results, key=results.get) if results else "B32 pad-attn"
    B = int(best.split()[0][1:])
    pad_mode = best.split()[1].replace("pad-", "")
    enc = DINOv2(variant="vitl", pad_mode=pad_mode)
    x = jnp.asarray(rng.normal(size=(B, SIZE, SIZE, 3)).astype(np.float32))
    p = jax.jit(lambda r: enc.init(r, x))(jax.random.PRNGKey(0))["params"]
    efwd = jax.jit(lambda pp, xi: enc.apply({"params": pp}, xi)[-1][0, 0, 0, 0])
    _ = float(efwd(p, x))
    esec = measure(lambda i: efwd(p, x + i * 1e-6), rtt)
    print(f"encoder-only {best}: {esec * 1e3:.1f} ms "
          f"({B / esec:.2f} img/s) -> head share = "
          f"{(B / results[best] - esec) * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
