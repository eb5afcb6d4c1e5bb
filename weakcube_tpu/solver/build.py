"""Optimizer/schedule builders (optax) with detectron2-style param groups.

Replaces the reference cubercnn/solver/build.py:
  * per-param-group hyperparams (bias LR factor, zero weight decay on norm
    params and biases, build.py:27-47) via optax.multi_transform over a
    label pytree;
  * sgd / adam / adam+amsgrad / adamw (build.py:49-67);
  * WarmupMultiStepLR (d2 default) as an optax schedule;
  * full-model gradient clipping (build.py:69);
  * freeze_bn (build.py:72-77) — in flax, BatchNorm stats only update when
    callers pass train=True AND apply mutable batch_stats; freezing is a
    trainer decision, so we expose a helper that zeroes BN param updates.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import optax


def build_lr_schedule(cfg) -> optax.Schedule:
    """WarmupMultiStepLR: linear warmup then step decay at SOLVER.STEPS."""
    base = cfg.SOLVER.BASE_LR
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR
    steps = list(cfg.SOLVER.STEPS)
    gamma = cfg.SOLVER.GAMMA

    def schedule(count):
        it = jnp.asarray(count, jnp.float32)
        # linear warmup
        alpha = jnp.clip(it / jnp.maximum(warmup_iters, 1), 0.0, 1.0)
        warm = warmup_factor * (1 - alpha) + alpha
        # multi-step decay
        decay = jnp.ones(())
        for s in steps:
            decay = decay * jnp.where(it >= s, gamma, 1.0)
        return base * warm * decay

    return schedule


def _param_labels(params) -> Any:
    """Label each param: 'bias' / 'norm' / 'default' for group hyperparams."""
    import jax

    def label(path, leaf):
        names = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
        last = names[-1] if names else ""
        if any(("bn" in n) or ("BatchNorm" in n) or ("norm" in n.lower() and "conv" not in n.lower())
               for n in names[:-1]) and last in ("scale", "bias", "mean", "var"):
            return "norm"
        if last == "bias":
            return "bias"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """Construct the configured optimizer with d2-style param groups."""
    schedule = build_lr_schedule(cfg)
    solver_type = cfg.SOLVER.TYPE
    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_norm = cfg.SOLVER.WEIGHT_DECAY_NORM
    wd_bias = cfg.SOLVER.WEIGHT_DECAY_BIAS
    if wd_bias is None:
        wd_bias = wd
    bias_lr_factor = cfg.SOLVER.BIAS_LR_FACTOR

    def core(lr_scale: float, weight_decay: float):
        chain = []
        if solver_type == "sgd":
            if weight_decay:
                chain.append(optax.add_decayed_weights(weight_decay))
            chain.append(optax.sgd(
                lambda c: schedule(c) * lr_scale,
                momentum=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV))
        elif solver_type in ("adam", "adam+amsgrad"):
            if weight_decay:
                chain.append(optax.add_decayed_weights(weight_decay))
            opt = optax.amsgrad if "amsgrad" in solver_type else optax.adam
            chain.append(opt(lambda c: schedule(c) * lr_scale))
        elif solver_type in ("adamw", "adamw+amsgrad"):
            chain.append(optax.adamw(lambda c: schedule(c) * lr_scale,
                                     weight_decay=weight_decay))
        else:
            raise ValueError(f"unknown SOLVER.TYPE {solver_type}")
        return optax.chain(*chain)

    tx = optax.multi_transform(
        {"default": core(1.0, wd),
         "bias": core(bias_lr_factor, wd_bias),
         "norm": core(1.0, wd_norm)},
        _param_labels(params))

    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "value":
            clip = optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
        else:
            clip = optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
        tx = optax.chain(clip, tx)
    return tx


def freeze_bn(tx: optax.GradientTransformation, params) -> optax.GradientTransformation:
    """Zero updates on BatchNorm scale/bias (reference freeze_bn semantics)."""
    import jax

    def label(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        return "frozen" if any("bn" in n or "BatchNorm" in n for n in names) else "train"

    labels = jax.tree_util.tree_map_with_path(label, params)
    return optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, labels)
