"""Sharded train/eval steps with the reference's stabilisation semantics.

Re-design of the reference train loop internals (tools/train_net.py:127-330):
  * loss-explosion detection vs a rolling mean (GAMMA=0.02) and non-finite
    guards (:165-220) — here a pure function of TrainState carried EMA; the
    skip decision is identical on every device under SPMD, so the
    explicit `dist.all_reduce(diverging)` (:248-261) disappears;
  * NaN/Inf gradient scan (:228-244) -> one jnp.isfinite all-reduce over the
    grad pytree, update skipped via lax masking (no host sync);
  * gradient all-reduce: implicit in jit over the data-sharded batch;
  * `allreduce_dict` loss logging (:497-524) -> losses are already global
    means of the sharded batch.

The retry-from-checkpoint outer loop (attempt counting, :456-493) lives in
the host-side trainer (tools/train_net.py here), as SURVEY §7.2 prescribes.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

GAMMA = 0.02            # rolling-mean smoothing (train_net.py:165)
EXPLOSION_FACTOR = 4.0  # loss > 4x rolling mean -> diverging (:202-220)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    loss_ema: jnp.ndarray        # rolling mean of the total loss
    ema_init: jnp.ndarray        # whether the EMA has been seeded
    skipped: jnp.ndarray         # count of skipped (diverging) updates
    applied: jnp.ndarray         # count of applied updates


def create_train_state(model, tx, batch, rng) -> Tuple[TrainState, Any]:
    variables = model.init({"params": rng}, batch, train=True,
                           rng=jax.random.fold_in(rng, 1))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        loss_ema=jnp.zeros(()),
        ema_init=jnp.zeros((), bool),
        skipped=jnp.zeros((), jnp.int32),
        applied=jnp.zeros((), jnp.int32),
    ), variables


def make_train_step(model, tx, remat: bool = False,
                    split: Optional[bool] = None) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, logs).

    remat=True wraps the forward in jax.checkpoint (rematerialisation),
    trading recompute for activation memory — the standard lever for larger
    per-chip batches (cfg.TPU REMAT knob in the trainer).

    split=True compiles the step as TWO XLA programs — (1) forward+backward
    producing grads, (2) stabilisation+optimizer producing the new state —
    instead of one. Same math, same logs; the host dispatches both per step
    and they pipeline back-to-back on-device (async dispatch), so
    steady-state throughput is unchanged. Round-3 motivation: the v5e
    worker reproducibly crashes compiling/running the MONOLITHIC step graph
    with the matmul ROIAlign forward (fwd+bwd alone and b<=4 steps are
    fine — a libtpu fault, not OOM or user error); the split compiles and
    runs clean. Default split=None: OPT-IN via cfg.TPU.SPLIT_TRAIN_STEP in
    the trainer, or WEAKCUBE_SPLIT_STEP=1 here (unset/0 = monolithic, the
    configuration measured end-to-end on the chip).
    """
    import os
    if split is None:
        split = os.environ.get("WEAKCUBE_SPLIT_STEP", "0").lower() \
            not in ("0", "false")

    def step_fn(state: TrainState, batch, rng):
        # expensive diagnostics (exact IoU3D) run every 200th step only
        # (reference roi_heads.py:936-945 "log 3d iou less frequently
        # because it is slow"); a traced bool so no recompile across steps.
        batch = dict(batch, metrics_tick=(state.step % 200 == 0))

        def fwd(params):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, rng=rng, mutable=["batch_stats"])
        if remat:
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            (losses, metrics), mut = fwd(params)
            total = jnp.sum(jnp.stack([v for v in losses.values()]))
            return total, (losses, metrics, mut)

        (total, (losses, metrics, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # ---- stabilisation ------------------------------------------------
        ema = jnp.where(state.ema_init, state.loss_ema, total)
        diverging = (~jnp.isfinite(total)) | (total > EXPLOSION_FACTOR *
                                              jnp.maximum(ema, 1e-8))
        grad_finite = jax.tree_util.tree_reduce(
            lambda acc, g: acc & jnp.all(jnp.isfinite(g)), grads, jnp.bool_(True))
        skip = diverging | ~grad_finite

        # clip the recorded loss into [0, 1] when diverging (train_net.py:210);
        # a non-finite loss records as 1.0 (clip(NaN) stays NaN otherwise and
        # would poison the EMA forever)
        recorded = jnp.where(diverging, jnp.clip(total, 0.0, 1.0), total)
        recorded = jnp.where(jnp.isfinite(recorded), recorded, 1.0)
        new_ema = jnp.where(state.ema_init,
                            ema * (1 - GAMMA) + GAMMA * recorded, recorded)

        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(skip | ~jnp.isfinite(g), 0.0, g), grads)
        updates, new_opt = tx.update(safe_grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # on skip: keep everything (optimizer state too, like zero_grad+no-step)
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(skip, old, new), new_params, state.params)
        new_opt = jax.tree_util.tree_map(
            lambda new, old: jnp.where(skip, old, new), new_opt, state.opt_state)
        new_bs = mut.get("batch_stats", state.batch_stats)
        new_bs = jax.tree_util.tree_map(
            lambda new, old: jnp.where(skip, old, new), new_bs, state.batch_stats)

        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, loss_ema=new_ema,
            ema_init=jnp.ones((), bool),
            skipped=state.skipped + skip.astype(jnp.int32),
            applied=state.applied + (1 - skip.astype(jnp.int32)))

        logs = dict(losses)
        logs.update(metrics)
        logs["total_loss"] = total
        logs["diverging"] = diverging.astype(jnp.float32)
        logs["grad_finite"] = grad_finite.astype(jnp.float32)
        return new_state, logs

    if not split:
        return jax.jit(step_fn, donate_argnums=(0,))

    # ---- split-step: program 1 = forward+backward -> grads ---------------
    def grads_fn(state: TrainState, batch, rng):
        batch = dict(batch, metrics_tick=(state.step % 200 == 0))

        def fwd(params):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, rng=rng, mutable=["batch_stats"])
        if remat:
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            (losses, metrics), mut = fwd(params)
            total = jnp.sum(jnp.stack([v for v in losses.values()]))
            return total, (losses, metrics, mut)

        (total, (losses, metrics, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return grads, total, losses, metrics, mut.get("batch_stats", {})

    # ---- split-step: program 2 = stabilisation + optimizer ---------------
    def update_fn(state: TrainState, grads, total, new_bs_raw):
        ema = jnp.where(state.ema_init, state.loss_ema, total)
        diverging = (~jnp.isfinite(total)) | (total > EXPLOSION_FACTOR *
                                              jnp.maximum(ema, 1e-8))
        grad_finite = jax.tree_util.tree_reduce(
            lambda acc, g: acc & jnp.all(jnp.isfinite(g)), grads,
            jnp.bool_(True))
        skip = diverging | ~grad_finite

        recorded = jnp.where(diverging, jnp.clip(total, 0.0, 1.0), total)
        recorded = jnp.where(jnp.isfinite(recorded), recorded, 1.0)
        new_ema = jnp.where(state.ema_init,
                            ema * (1 - GAMMA) + GAMMA * recorded, recorded)

        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(skip | ~jnp.isfinite(g), 0.0, g), grads)
        updates, new_opt = tx.update(safe_grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(skip, old, new), new_params,
            state.params)
        new_opt = jax.tree_util.tree_map(
            lambda new, old: jnp.where(skip, old, new), new_opt,
            state.opt_state)
        new_bs = new_bs_raw if new_bs_raw else state.batch_stats
        new_bs = jax.tree_util.tree_map(
            lambda new, old: jnp.where(skip, old, new), new_bs,
            state.batch_stats)

        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, loss_ema=new_ema,
            ema_init=jnp.ones((), bool),
            skipped=state.skipped + skip.astype(jnp.int32),
            applied=state.applied + (1 - skip.astype(jnp.int32)))
        return new_state, diverging.astype(jnp.float32), \
            grad_finite.astype(jnp.float32)

    jit_grads = jax.jit(grads_fn)
    # state is donated in program 2 only (program 1 has already consumed it
    # by the time program 2 runs — single-device programs execute in
    # dispatch order); grads are consumed here too
    jit_update = jax.jit(update_fn, donate_argnums=(0, 1))

    def stepped(state: TrainState, batch, rng):
        grads, total, losses, metrics, new_bs = jit_grads(state, batch, rng)
        new_state, diverging, grad_finite = jit_update(state, grads, total,
                                                       new_bs)
        logs = dict(losses)
        logs.update(metrics)
        logs["total_loss"] = total
        logs["diverging"] = diverging
        logs["grad_finite"] = grad_finite
        return new_state, logs

    # exposed for cost analysis (bench.py): lowering `stepped` through one
    # outer jit would reconstitute the monolithic graph the split avoids
    stepped.jit_grads = jit_grads
    stepped.jit_update = jit_update
    return stepped


def make_eval_step(model) -> Callable:
    def eval_fn(params, batch_stats, batch):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           batch, train=False)
    return jax.jit(eval_fn)
