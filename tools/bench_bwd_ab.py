#!/usr/bin/env python
"""A/B the recipe-scale forward+backward under ROIAlign-backward plans.

Variants (env WEAKCUBE_RA_BWD / WEAKCUBE_PALLAS_BWD consumed inside the
custom_vjp, so each variant is its own jit):
  zero      RA backward returns zeros  -> everything EXCEPT the pooler bwd
  scatter   default XLA scatter-add plan
  pallas    Pallas RMW transpose kernel

Prints one JSON line per variant. Run on the real TPU.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from bench_train_stages import build, jax_block, timed

    variants = (os.environ.get("BENCH_BWD_VARIANTS") or
                "zero,scatter,pallas").split(",")
    model, tx, state, batch, rng = build()
    batch = dict(batch, metrics_tick=jnp.zeros((), bool))
    params, batch_stats = state.params, state.batch_stats
    r2 = jax.random.fold_in(rng, 2)

    def fwd(p):
        (losses, _m), _ = model.apply(
            {"params": p, "batch_stats": batch_stats},
            batch, train=True, rng=r2, mutable=["batch_stats"])
        return jnp.sum(jnp.stack(list(losses.values())))

    def loss_and_gnorm(p):
        val, grads = jax.value_and_grad(fwd)(p)
        return val + 0.0 * optax.global_norm(grads)

    for tag in variants:
        os.environ.pop("WEAKCUBE_RA_BWD", None)
        os.environ.pop("WEAKCUBE_PALLAS_BWD", None)
        if tag == "zero":
            os.environ["WEAKCUBE_RA_BWD"] = "zero"
        elif tag == "pallas":
            os.environ["WEAKCUBE_PALLAS_BWD"] = "1"
        g = jax.jit(loss_and_gnorm)
        t0 = time.perf_counter()
        sec = timed(lambda: g(params))
        print(f"# {tag} compiled+timed in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)
        print(json.dumps({"metric": f"fwd_bwd_ra_{tag}",
                          "value": round(sec * 1e3, 1), "unit": "ms/step"}))


if __name__ == "__main__":
    main()
