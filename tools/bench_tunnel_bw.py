#!/usr/bin/env python
"""Measure the axon tunnel's host->device bulk-upload bandwidth.

Two payloads of recipe-batch size (~33.6 MB): all-zeros (maximally
compressible, in case the tunnel compresses) and uniform-random uint8
(incompressible). Also measures whether an upload OVERLAPS device compute:
device_put of batch N+1 issued while a long matmul chain is running —
if the tunnel serializes transfers behind dispatched programs, the
overlapped wall time ~= sum instead of max.

Run: python tools/bench_tunnel_bw.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    MB = 33.6
    n = int(MB * 1e6)
    zeros = np.zeros(n, np.uint8)
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, n, dtype=np.uint8)

    # warm the path
    _ = jax.device_put(np.ones(1024, np.uint8)).block_until_ready()

    for name, payload in (("zeros", zeros), ("noise", noise)):
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            x = jax.device_put(payload)
            x.block_until_ready()
            ts.append(time.perf_counter() - t0)
            del x
        sec = float(np.median(ts))
        print(f"RESULT tunnel_bw {name} {MB:.1f}MB {sec * 1e3:.0f}ms "
              f"{MB / sec:.0f}MB/s", flush=True)

    # overlap probe: a ~300 ms compute program vs a concurrent upload
    m = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def burn(a):
        def body(x, _):
            return x @ m, None
        y, _ = jax.lax.scan(body, a, None, length=220)
        return y

    _ = burn(m).block_until_ready()
    t0 = time.perf_counter()
    _ = burn(m).block_until_ready()
    compute = time.perf_counter() - t0
    print(f"RESULT tunnel_bw compute_only {compute * 1e3:.0f}ms", flush=True)

    t0 = time.perf_counter()
    y = burn(m)                      # async dispatch
    x = jax.device_put(noise)        # upload while it runs
    x.block_until_ready()
    y.block_until_ready()
    both = time.perf_counter() - t0
    print(f"RESULT tunnel_bw overlapped {both * 1e3:.0f}ms "
          f"(serial would be ~{(compute + float(np.median(ts))) * 1e3:.0f}ms)",
          flush=True)


if __name__ == "__main__":
    main()
