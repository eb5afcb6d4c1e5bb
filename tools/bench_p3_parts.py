#!/usr/bin/env python
"""P3 (backbone surrogate-fwd + bwd, ~64 ms of the round-4 323 ms step) is
~21x the 3 ms backbone FORWARD — decompose where the backward goes on the
real TPU. Parts run standalone at recipe scale (b25@512, DLA34-FPN bf16):

  fwd          full backbone (DLA34 + FPN) forward               (~3 ms r4)
  fwdbwd       value+grad wrt params of sum(feats^2)             (~P3 proxy)
  dla_fwd      DLA34 trunk alone, forward
  dla_fwdbwd   DLA34 trunk alone, fwd+bwd
  fpn_fwdbwd   FPN alone on fixed trunk features, fwd+bwd
  fwdbwd_nobn  full backbone fwd+bwd with train=False (frozen BN stats —
               isolates the batch-stats mutation cost)
  fwdbwd_f32   full backbone fwd+bwd in float32 (dtype-layout probe)

One variant per process (pass as argv[1]); `all` runs everything (backbone
graphs have not faulted this libtpu).

Run: python tools/bench_p3_parts.py all
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_train_stages import timed  # noqa: E402


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    import jax.numpy as jnp
    import optax

    from weakcube_tpu.config import get_cfg
    from weakcube_tpu.models.backbone.build import build_backbone

    B = int(os.environ.get("BENCH_TRAIN_BATCH", 25))
    S = int(os.environ.get("BENCH_TRAIN_SIZE", 512))
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_dla_from_vision_fpn_backbone"
    cfg.MODEL.DLA.TYPE = "dla34"
    cfg.TPU.IMAGE_SIZE = S
    cfg.freeze()

    dtype = jnp.float32 if variant == "fwdbwd_f32" else jnp.bfloat16
    bb = build_backbone(cfg, dtype)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, S, S, 3)).astype(np.float32))
    variables = jax.jit(lambda: bb.init(jax.random.PRNGKey(0), x,
                                        train=True))()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    results = {}

    def measure(tag, thunk, iters=8):
        t0 = time.perf_counter()
        try:
            results[tag] = timed(thunk, iters=iters)
            print(f"# {tag}: {results[tag] * 1e3:.1f} ms (setup "
                  f"{time.perf_counter() - t0:.0f}s)", file=sys.stderr,
                  flush=True)
        except Exception as e:
            print(f"# {tag} FAILED: {e!r}", file=sys.stderr, flush=True)

    want = lambda *names: variant == "all" or variant in names

    def bb_loss(p, train=True):
        out = bb.apply({"params": p, "batch_stats": batch_stats}, x,
                       train=train, mutable=["batch_stats"] if train else [])
        feats = out[0] if train else out
        return sum(jnp.sum(f.astype(jnp.float32) ** 2)
                   for f in feats.values())

    if want("fwd"):
        f = jax.jit(bb_loss)
        measure("fwd", lambda: float(f(params)))
    if want("fwdbwd", "fwdbwd_f32"):
        tag = "fwdbwd_f32" if variant == "fwdbwd_f32" else "fwdbwd"
        g = jax.jit(lambda p: optax.global_norm(jax.grad(bb_loss)(p)))
        measure(tag, lambda: float(g(params)))
    if want("fwdbwd_nobn"):
        g2 = jax.jit(lambda p: optax.global_norm(
            jax.grad(lambda q: bb_loss(q, train=False))(p)))
        measure("fwdbwd_nobn", lambda: float(g2(params)))

    if want("dla_fwd", "dla_fwdbwd", "fpn_fwdbwd"):
        from weakcube_tpu.models.backbone.dla import DLABottomUp
        dla = DLABottomUp(dla_type="dla34", dtype=dtype)
        dvars = jax.jit(lambda: dla.init(jax.random.PRNGKey(0), x,
                                         train=True))()
        dparams = dvars["params"]
        dstats = dvars.get("batch_stats", {})

        def dla_loss(p):
            feats, _ = dla.apply({"params": p, "batch_stats": dstats}, x,
                                 train=True, mutable=["batch_stats"])
            return sum(jnp.sum(f.astype(jnp.float32) ** 2)
                       for f in feats.values())

        if want("dla_fwd"):
            f = jax.jit(dla_loss)
            measure("dla_fwd", lambda: float(f(dparams)))
        if want("dla_fwdbwd"):
            g = jax.jit(lambda p: optax.global_norm(jax.grad(dla_loss)(p)))
            measure("dla_fwdbwd", lambda: float(g(dparams)))

        if want("fpn_fwdbwd"):
            from weakcube_tpu.models.backbone.fpn import FPN
            feats0, _ = jax.jit(lambda p: dla.apply(
                {"params": p, "batch_stats": dstats}, x, train=True,
                mutable=["batch_stats"]))(dparams)
            fpn = FPN(tuple(cfg.MODEL.FPN.IN_FEATURES),
                      cfg.MODEL.FPN.OUT_CHANNELS, cfg.MODEL.FPN.FUSE_TYPE,
                      dtype)
            fvars = jax.jit(lambda: fpn.init(jax.random.PRNGKey(0),
                                             feats0))()

            def fpn_loss(p, fs):
                out = fpn.apply({"params": p}, fs)
                return sum(jnp.sum(f.astype(jnp.float32) ** 2)
                           for f in out.values())
            g = jax.jit(lambda p, fs: optax.global_norm(
                jax.grad(fpn_loss)(p, fs)))
            measure("fpn_fwdbwd", lambda: float(g(fvars["params"], feats0)))

    for k, v in results.items():
        print(json.dumps({"metric": f"p3_part_{k}",
                          "value": round(v * 1e3, 2), "unit": "ms"}))


if __name__ == "__main__":
    main()
