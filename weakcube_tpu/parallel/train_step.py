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

# Batch keys the backbone-split rest program (P2) consumes — the single
# source of truth for the allowlist (stepped_bb below, bench.py cost
# analysis, tools/bench_train_stages.py, tools/bench_p2_profile.py).
# ground_normal / ground_normal_valid (the host-prefitted ground-plane
# cache) and any stale metrics_tick are DELIBERATELY excluded: the round-4
# P2 bisect (tools/bench_p2_variants.py) found the cached-normal arrays as
# runtime arguments of the einsum program fault the 2026-08 axon libtpu —
# the rest program fits the plane in-graph instead (ops/plane.py RANSAC,
# the reference's own per-step semantics).
REST_BATCH_KEYS = ("gt", "image_wh", "K", "depth_map", "ground_mask",
                   "ground_mask_bits", "ground_valid", "instance_masks",
                   "rpn_labels")


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


def _parse_split(val):
    """Normalise a split spec (bool / env string / YAML value) to one of
    False (monolithic), True (grads/update two-program), 'backbone'
    (four-program backbone split)."""
    if isinstance(val, str):
        v = val.strip().lower()
        if v in ("backbone", "backbone2"):
            return v
        return v not in ("", "0", "false", "none")
    return bool(val)


def _overlay(dst, src):
    """Recursively overlay the partial batch_stats mapping `src` (one split
    program's mutated collections) onto the full template `dst`."""
    from collections.abc import Mapping
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, Mapping) and isinstance(out.get(k), Mapping):
            out[k] = _overlay(out[k], v)
        else:
            out[k] = v
    return out


def make_train_step(model, tx, remat: bool = False,
                    split=None) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, logs).

    remat=True wraps the forward in jax.checkpoint (rematerialisation),
    trading recompute for activation memory — the standard lever for larger
    per-chip batches (cfg.TPU REMAT knob in the trainer).

    split=True compiles the step as TWO XLA programs — (1) forward+backward
    producing grads, (2) stabilisation+optimizer producing the new state —
    instead of one. Same math, same logs; the host dispatches both per step
    and they pipeline back-to-back on-device (async dispatch), so
    steady-state throughput is unchanged.

    split="backbone" compiles FOUR programs — (1) backbone forward,
    (2) everything downstream of the backbone, fwd+bwd w.r.t. (params,
    features), (3) backbone backward via a re-run with the surrogate loss
    sum(feats·g_feats) (exact chain rule; the re-run doubles as free
    backbone rematerialisation), (4) stabilisation+optimizer. This is the
    ONLY structure in which the dense-einsum ROIAlign forward
    (cfg.TPU.ROI_ALIGN_TRAIN_FWD='matmul', 299 vs 482 ms fwd+bwd measured)
    runs without faulting the 2026-08 axon libtpu: the round-4
    arg-narrowing bisect (tools/bench_escapes.py) showed the fault needs
    the depth/ground-map runtime arguments, the backbone convs, and the
    pooler einsums all in ONE program; here the maps+einsums program (2)
    has no backbone and the backbone programs (1)/(3) have no maps.
    Measured on the v5e: 321 ms/step before the optimizer vs 480 ms for
    the monolithic gather step.

    Known deviation: program 2 DROPS the host-prefitted ground-normal
    cache (batch["ground_normal"/"ground_normal_valid"]) and fits the
    ground plane in-graph instead — the cached-normal graph faults the
    same libtpu in any argument packaging (round-4 P2 bisect,
    tools/bench_p2_variants.py). In-graph RANSAC per step is the
    REFERENCE's own semantics (cubercnn computes ground normals inside
    the loss every iteration); the cache is a monolithic-path-only
    optimization, and its cost is already inside the measured 321 ms.

    Default split=None resolves WEAKCUBE_SPLIT_STEP (env, trace-time
    sweeps) then cfg.TPU.SPLIT_TRAIN_STEP (YAML).
    """
    import os
    if split is None:
        env = os.environ.get("WEAKCUBE_SPLIT_STEP")
        if env is not None:
            split = _parse_split(env)
        else:
            try:
                split = _parse_split(model.cfg.TPU.SPLIT_TRAIN_STEP)
            except AttributeError:
                split = False
    else:
        split = _parse_split(split)

    # Guard the known-fatal combination on real TPUs: the matmul ROIAlign
    # forward inside a monolithic (or grads/update-split) step graph
    # reproducibly crashes the axon libtpu worker, with a 13-45 min
    # recovery. Only the backbone split runs it clean.
    try:
        cfg_fwd = model.cfg.TPU.ROI_ALIGN_TRAIN_FWD
    except AttributeError:
        cfg_fwd = "gather"
    fwd_plan = os.environ.get("WEAKCUBE_RA_TRAIN_FWD", cfg_fwd)
    if (fwd_plan in ("matmul", "pallas")
            and split not in ("backbone", "backbone2")
            and jax.default_backend() != "cpu"
            and os.environ.get("WEAKCUBE_ALLOW_FAULTY_COMBO", "0") == "0"):
        raise RuntimeError(
            f"ROI_ALIGN_TRAIN_FWD={fwd_plan!r} with split="
            f"{split!r} faults the current libtpu (worker crash, 13-45 min "
            "recovery; NOTES_NEXT_ROUND.md bisect — both the dense-einsum "
            "and the Pallas forward crash inside monolithic train graphs). "
            "Use TPU.SPLIT_TRAIN_STEP='backbone', or ROI_ALIGN_TRAIN_FWD="
            "'gather', or set WEAKCUBE_ALLOW_FAULTY_COMBO=1 to run a "
            "deliberate crash repro.")

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

    if split in ("backbone", "backbone2"):
        # ---- four-program backbone split (see docstring); "backbone2"
        # merges programs 3+4 (backbone bwd + update) into one, saving a
        # dispatch and letting XLA fuse the optimizer into the conv
        # backwards -------------------------------------------------------
        def bb_fwd_fn(params, batch_stats, image):
            feats, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                image, train=True, mutable=["batch_stats"],
                method="backbone_forward")
            return feats, mut.get("batch_stats", {})

        # Everything downstream of the backbone holds NO BatchNorm in this
        # architecture (batch_stats live under the backbone-owned scopes
        # only), so this program neither takes nor returns batch_stats —
        # which also keeps its runtime-argument set exactly the
        # (params, feats, maps, rng) shape the round-4 crash bisect proved
        # clean alongside the pooler einsums.
        #
        # STRUCTURE IS LOAD-BEARING: the batch/rng must flow into loss_fn
        # as EXPLICIT value_and_grad arguments, not via closure over
        # trace-time values — the bisect (tools/bench_p2_variants.py)
        # found the closure form of this same math faulting the 2026-08
        # axon libtpu worker while this explicit-args form runs clean
        # (closures reorder the backward's constvars, which changes
        # instruction scheduling enough to dodge the compiler bug).
        def rest_loss_fn(p, f, bt, r):
            apply = lambda p_, f_: model.apply(
                {"params": p_}, f_, bt, train=True, rng=r,
                method="forward_from_features")
            if remat:
                apply = jax.checkpoint(apply)
            losses, metrics = apply(p, f)
            total = jnp.sum(jnp.stack([v for v in losses.values()]))
            return total, (losses, metrics)

        rest_vg = jax.value_and_grad(rest_loss_fn, argnums=(0, 1),
                                     has_aux=True)

        def rest_fn(params, feats, step, batch, rng):
            batch = dict(batch, metrics_tick=(step % 200 == 0))
            (total, (losses, metrics)), (g_p, g_f) = rest_vg(
                params, feats, batch, rng)
            # g_p has zeros at the backbone leaves (unused here); the
            # backbone grads arrive from program 3 and are summed in the
            # update program
            return g_p, g_f, total, losses, metrics

        def bb_bwd_fn(params, batch_stats, image, g_feats):
            # exact chain rule: d/dp sum_k<feats_k(p), g_k> = J^T g; the
            # f32 accumulation only affects the (discarded) scalar — the
            # cotangent entering the backbone backward is g_feats itself
            def surrogate(p):
                feats, _ = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    image, train=True, mutable=["batch_stats"],
                    method="backbone_forward")
                return sum(jnp.sum(feats[k].astype(jnp.float32)
                                   * g_feats[k].astype(jnp.float32))
                           for k in g_feats)
            return jax.grad(surrogate)(params)

        # flax returns the FULL mutable collection from every apply, but
        # only program 1 runs BN here — its fresh stats (the backbone-owned
        # subtrees: "bottom_up" adopted at the root + "backbone") overlay
        # the state template in the update program.
        BB_KEYS = ("bottom_up", "backbone")

        def update_bb_fn(state, g_rest, g_bb, total, bb_stats):
            grads = jax.tree_util.tree_map(jnp.add, g_rest, g_bb)
            from_bb = {k: v for k, v in bb_stats.items() if k in BB_KEYS}
            new_bs = _overlay(dict(state.batch_stats), from_bb)
            return update_fn(state, grads, total, new_bs)

        def bb_bwd_update_fn(state, image, g_feats, g_rest, total,
                             bb_stats):
            # "backbone2": programs 3+4 fused — backbone bwd via the same
            # surrogate, then grad-sum + stabilised update in one program
            def surrogate(p):
                feats, _ = model.apply(
                    {"params": p, "batch_stats": state.batch_stats},
                    image, train=True, mutable=["batch_stats"],
                    method="backbone_forward")
                return sum(jnp.sum(feats[k].astype(jnp.float32)
                                   * g_feats[k].astype(jnp.float32))
                           for k in g_feats)
            g_bb = jax.grad(surrogate)(state.params)
            return update_bb_fn(state, g_rest, g_bb, total, bb_stats)

        merged = split == "backbone2"
        jit_bb_fwd = jax.jit(bb_fwd_fn)
        jit_rest = jax.jit(rest_fn)
        jit_bb_bwd = jax.jit(bb_bwd_fn)
        # single-device programs run in dispatch order, so by the time the
        # update executes, programs 1-3 have finished reading state; the
        # grad trees are donated into the sum
        jit_update_bb = jax.jit(update_bb_fn, donate_argnums=(0, 1, 2))
        jit_bb_bwd_update = jax.jit(bb_bwd_update_fn, donate_argnums=(0, 3))

        def stepped_bb(state: TrainState, batch, rng):
            extra = [k for k in (state.batch_stats or {}) if k not in BB_KEYS]
            if extra:
                raise NotImplementedError(
                    "split='backbone' assumes all BatchNorm state lives in "
                    f"the backbone; found head batch_stats under {extra} — "
                    "use split=True for this model.")
            image = batch["image"]
            # Explicit allowlist of the keys the rest program consumes —
            # see REST_BATCH_KEYS above for why the cached ground normals
            # (and any stale metrics_tick) are excluded.
            rest_batch = {k: v for k, v in batch.items()
                          if k in REST_BATCH_KEYS}
            feats, bb_stats = jit_bb_fwd(state.params, state.batch_stats,
                                         image)
            g_rest, g_feats, total, losses, metrics = jit_rest(
                state.params, feats, state.step, rest_batch, rng)
            if merged:
                new_state, diverging, grad_finite = jit_bb_bwd_update(
                    state, image, g_feats, g_rest, total, bb_stats)
            else:
                g_bb = jit_bb_bwd(state.params, state.batch_stats, image,
                                  g_feats)
                new_state, diverging, grad_finite = jit_update_bb(
                    state, g_rest, g_bb, total, bb_stats)
            logs = dict(losses)
            logs.update(metrics)
            logs["total_loss"] = total
            logs["diverging"] = diverging
            logs["grad_finite"] = grad_finite
            return new_state, logs

        stepped_bb.jit_bb_fwd = jit_bb_fwd
        stepped_bb.jit_rest = jit_rest
        stepped_bb.jit_bb_bwd = jit_bb_bwd
        stepped_bb.jit_update = jit_update_bb
        stepped_bb.jit_bb_bwd_update = jit_bb_bwd_update
        stepped_bb.split = split
        return stepped_bb

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
