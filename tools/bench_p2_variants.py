#!/usr/bin/env python
"""Round-4 P2 (rest-from-features fwd+bwd) crash bisect, one variant per
process.

Ground truth: the bench_escapes `split_backbone` p2 — args (params, feats,
maps+metrics_tick, rng), batch_stats closed over with mutable, loss-only
output, value_and_grad argnums=(0,1) WITHOUT aux — runs clean on the v5e
(321 ms three-program step, 2026-08-21). The production rest_fn
(parallel/train_step.py split="backbone") crashes the worker. Deltas, one
per variant here, from the clean base:

  base      the harness p2 verbatim (re-confirm clean)
  losses    + has_aux returning the per-loss dict (scalars)
  metrics   + returning the metrics dict too — keeps the every-200-step
            exact-IoU3D lax.cond subgraph LIVE instead of DCE'd
  step      metrics_tick computed in-graph from an int32 `step` argument
            (the production form) instead of a bool argument
  nostats   apply WITHOUT the batch_stats collection / mutable (the heads
            hold no BN, so the production rest_fn dropped them)
  prod      the shipped rest_fn itself (all deltas; control: crashes)

Run: python tools/bench_p2_variants.py <variant>
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_train_stages import build, timed  # noqa: E402


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    os.environ.setdefault("WEAKCUBE_RA_TRAIN_FWD", "matmul")
    import jax
    import jax.numpy as jnp

    model, tx, state, batch, rng = build()
    params, batch_stats = state.params, state.batch_stats
    r2 = jax.random.fold_in(rng, 2)
    batch = dict(batch, metrics_tick=jnp.zeros((), bool))

    # program 1 (clean, measured): features
    @jax.jit
    def p1(p, image):
        feats, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, image, train=True,
            mutable=["batch_stats"], method="backbone_forward")
        return feats

    feats = p1(params, batch["image"])
    maps = {k: batch[k] for k in ("gt", "image_wh", "K", "depth_map",
                                  "ground_mask", "ground_valid",
                                  "metrics_tick") if k in batch}

    with_stats = variant != "nostats"

    def apply_rest(p, f, bt, r):
        var = {"params": p}
        if with_stats:
            var["batch_stats"] = batch_stats
            out, _ = model.apply(var, f, bt, train=True, rng=r,
                                 mutable=["batch_stats"],
                                 method="forward_from_features")
            return out
        return model.apply(var, f, bt, train=True, rng=r,
                           method="forward_from_features")

    if variant in ("base", "nostats"):
        def loss_fn(p, f, bt, r):
            losses, _m = apply_rest(p, f, bt, r)
            return jnp.sum(jnp.stack(list(losses.values())))
        vg = jax.value_and_grad(loss_fn, argnums=(0, 1))
        f = jax.jit(lambda p, ft, bt, r: vg(p, ft, bt, r))
        call = lambda: f(params, feats, maps, r2)[0]
    elif variant == "losses":
        def loss_fn(p, f, bt, r):
            losses, _m = apply_rest(p, f, bt, r)
            return jnp.sum(jnp.stack(list(losses.values()))), losses
        vg = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        f = jax.jit(lambda p, ft, bt, r: vg(p, ft, bt, r))
        call = lambda: f(params, feats, maps, r2)[0][0]
    elif variant == "metrics":
        def loss_fn(p, f, bt, r):
            losses, metrics = apply_rest(p, f, bt, r)
            return jnp.sum(jnp.stack(list(losses.values()))), \
                (losses, metrics)
        vg = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        f = jax.jit(lambda p, ft, bt, r: vg(p, ft, bt, r))
        call = lambda: f(params, feats, maps, r2)[0][0]
    elif variant == "step":
        def loss_fn(p, f, bt, r):
            losses, _m = apply_rest(p, f, bt, r)
            return jnp.sum(jnp.stack(list(losses.values())))
        vg = jax.value_and_grad(loss_fn, argnums=(0, 1))

        def outer(p, ft, step, bt, r):
            bt = dict(bt, metrics_tick=(step % 200 == 0))
            return vg(p, ft, bt, r)
        f = jax.jit(outer)
        call = lambda: f(params, feats, state.step,
                         {k: v for k, v in maps.items()
                          if k != "metrics_tick"}, r2)[0]
    elif variant == "prod":
        from weakcube_tpu.parallel import make_train_step
        sp = make_train_step(model, tx, split="backbone")
        rest_batch = {k: v for k, v in batch.items() if k != "image"}
        call = lambda: sp.jit_rest(params, state.step, feats, rest_batch,
                                   r2)[2]
    else:
        raise ValueError(variant)

    t0 = time.perf_counter()
    loss0 = float(call())
    print(f"# {variant}: compile+first {time.perf_counter() - t0:.0f}s "
          f"loss {loss0:.3f}", file=sys.stderr, flush=True)
    sec = timed(call, iters=6)
    print(f"RESULT {variant} ok step_ms {sec * 1e3:.1f}", flush=True)


if __name__ == "__main__":
    main()
