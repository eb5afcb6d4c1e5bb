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

    if "prodfeats" in variant:
        # feats from the PRODUCTION program-1 (which also emits the BN
        # stats): on TPU its outputs may carry different on-device layouts
        # than the local p1's, and jit specializes on input layouts — if
        # the otherwise-clean composed program crashes with these feats,
        # the fault is layout-keyed, not graph-keyed.
        from weakcube_tpu.parallel import make_train_step
        sp0 = make_train_step(model, tx, split="backbone")
        feats, _bbst = sp0.jit_bb_fwd(params, batch_stats, batch["image"])
        variant = variant.replace("prodfeats+", "").replace("+prodfeats", "")
    else:
        feats = p1(params, batch["image"])
    maps = {k: batch[k] for k in ("gt", "image_wh", "K", "depth_map",
                                  "ground_mask", "ground_mask_bits",
                                  "ground_valid", "metrics_tick")
            if k in batch}

    if variant in ("prod", "prod_nodead"):
        # prod: the shipped jit_rest with the decomposition's rest_batch
        # (which carries a DEAD metrics_tick input — overridden in-graph).
        # prod_nodead: same program, dead input dropped — isolates whether
        # an unused runtime argument is what faults the worker.
        from weakcube_tpu.parallel import make_train_step
        sp = make_train_step(model, tx, split="backbone")
        drop = ("image",) if variant == "prod" else ("image", "metrics_tick")
        rest_batch = {k: v for k, v in batch.items() if k not in drop}
        call = lambda: sp.jit_rest(params, feats, state.step, rest_batch,
                                   r2)[2]
    else:
        # compose one-or-more deltas off the clean harness base:
        #   aux      return the (losses, metrics) dicts via has_aux
        #   losses   return only the losses dict via has_aux
        #   step     metrics_tick from an int32 step argument, in-graph
        #   nostats  apply without the batch_stats collection / mutable
        # e.g. "aux+step", "aux+nostats", "step+nostats", "aux+step+nostats"
        deltas = set() if variant == "base" else set(variant.split("+"))
        if "metrics" in deltas:   # legacy alias for "aux"
            deltas = (deltas - {"metrics"}) | {"aux"}
        known = {"aux", "losses", "step", "nostats", "flat", "gn", "gnpack"}
        if deltas - known:
            raise ValueError(f"{variant}: unknown deltas {deltas - known}")
        # gn: the host-prefitted ground normals ride in as runtime args —
        # the ONE key difference between every clean composed run and the
        # crashing production jit_rest (which got them via its allowlist).
        # gnpack: same data as a single packed (B, 4) f32 argument,
        # unpacked in-graph — tests whether the fault keys on the raw
        # (B,3) f32 + (B,) bool argument pair rather than the graph.
        if "gn" in deltas:
            maps = dict(maps, ground_normal=batch["ground_normal"],
                        ground_normal_valid=batch["ground_normal_valid"])
        with_stats = "nostats" not in deltas

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

        if "aux" in deltas or "losses" in deltas:
            def loss_fn(p, f, bt, r):
                losses, metrics = apply_rest(p, f, bt, r)
                aux = losses if "losses" in deltas else (losses, metrics)
                return jnp.sum(jnp.stack(list(losses.values()))), aux
            vg = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
            first = lambda out: out[0][0]
        else:
            def loss_fn(p, f, bt, r):
                losses, _m = apply_rest(p, f, bt, r)
                return jnp.sum(jnp.stack(list(losses.values())))
            vg = jax.value_and_grad(loss_fn, argnums=(0, 1))
            first = lambda out: out[0]

        if "gnpack" in deltas:
            # prod-shaped flat program, normals packed into ONE f32 arg
            gnp = jnp.concatenate(
                [batch["ground_normal"],
                 batch["ground_normal_valid"].astype(jnp.float32)[:, None]],
                axis=1)

            def outer_gnp(p, ft, step, bt, gnp, r):
                bt = dict(bt, metrics_tick=(step % 200 == 0),
                          ground_normal=gnp[:, :3],
                          ground_normal_valid=gnp[:, 3] > 0.5)
                (total, aux), (g_p, g_f) = vg(p, ft, bt, r)
                losses, metrics = aux
                return g_p, g_f, total, losses, metrics
            f = jax.jit(outer_gnp)
            maps_nt = {k: v for k, v in maps.items()
                       if k not in ("metrics_tick", "ground_normal",
                                    "ground_normal_valid")}
            call = lambda: f(params, feats, state.step, maps_nt, gnp, r2)[2]
        elif "flat" in deltas:
            # exact production output layout: the flattened
            # (g_p, g_f, total, losses, metrics) tuple instead of the
            # nested value_and_grad structure — the only remaining
            # difference from the clean composed aux+step+nostats once
            # prod_nodead also crashed
            def outer_flat(p, ft, step, bt, r):
                bt = dict(bt, metrics_tick=(step % 200 == 0))
                (total, aux), (g_p, g_f) = vg(p, ft, bt, r)
                losses, metrics = aux
                return g_p, g_f, total, losses, metrics
            f = jax.jit(outer_flat)
            maps_nt = {k: v for k, v in maps.items() if k != "metrics_tick"}
            call = lambda: f(params, feats, state.step, maps_nt, r2)[2]
        elif "step" in deltas:
            def outer(p, ft, step, bt, r):
                bt = dict(bt, metrics_tick=(step % 200 == 0))
                return vg(p, ft, bt, r)
            f = jax.jit(outer)
            maps_nt = {k: v for k, v in maps.items() if k != "metrics_tick"}
            call = lambda: first(f(params, feats, state.step, maps_nt, r2))
        else:
            f = jax.jit(lambda p, ft, bt, r: vg(p, ft, bt, r))
            call = lambda: first(f(params, feats, maps, r2))

    t0 = time.perf_counter()
    loss0 = float(call())
    print(f"# {variant}: compile+first {time.perf_counter() - t0:.0f}s "
          f"loss {loss0:.3f}", file=sys.stderr, flush=True)
    sec = timed(call, iters=6)
    print(f"RESULT {variant} ok step_ms {sec * 1e3:.1f}", flush=True)


if __name__ == "__main__":
    main()
