"""Masked, static-shape subsampling — replaces `torch.multinomial` and
detectron2's `subsample_labels` (reference: cubercnn/modeling/
proposal_generator/rpn.py:275-328 IoU-weighted anchor subsampling, and
roi_heads.py:1201 `_sample_proposals`).

Key primitive: Gumbel top-k. Adding i.i.d. Gumbel noise to log-weights and
taking the top-k indices draws k items *without replacement* with
probability proportional to the weights — a single `lax.top_k`, no rejection
loops, no dynamic shapes. With uniform weights it degrades to a uniform
random choice, covering d2's plain subsample path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e10


def gumbel_topk_mask(key: jax.Array, log_weights: jnp.ndarray,
                     valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """Select up to k items w.p. proportional to exp(log_weights).

    Args:
      key: PRNG key.
      log_weights: (N,) unnormalised log-probabilities.
      valid: (N,) bool — invalid items are never selected.
      k: static number of items to draw (fewer if fewer are valid).
    Returns:
      (N,) bool selection mask with sum(mask) == min(k, sum(valid)).
    """
    n = log_weights.shape[0]
    g = jax.random.gumbel(key, (n,), dtype=log_weights.dtype)
    scores = jnp.where(valid, log_weights + g, _NEG)
    _, idx = jax.lax.top_k(scores, min(k, n))
    picked = jnp.zeros((n,), dtype=bool).at[idx].set(True)
    return picked & valid


def uniform_topk_mask(key: jax.Array, valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """Uniformly choose up to k valid items (d2 `subsample_labels` branch)."""
    return gumbel_topk_mask(key, jnp.zeros(valid.shape, jnp.float32), valid, k)


def rank_budget_mask(scores: jnp.ndarray, valid: jnp.ndarray,
                     budget: jnp.ndarray, max_budget: int) -> jnp.ndarray:
    """`valid & (descending-rank(scores) < budget)` WITHOUT a full sort.

    `budget` is a traced scalar bounded by the static `max_budget`. A full
    argsort + rank scatter over N anchors (the d2 pattern) is an O(N log N)
    bitonic sort on TPU; the same mask falls out of one `lax.top_k` of only
    `max_budget` values: the budget-th largest score is the cut, and every
    valid score >= the cut is in-budget. Exact for continuous (gumbel-noised)
    scores, where ties have probability zero; with fewer than `budget` valid
    items the cut lands on the _NEG padding and every valid item is kept,
    matching the sort-based semantics.
    """
    masked = jnp.where(valid, scores, _NEG)
    top, _ = jax.lax.top_k(masked, min(max_budget, masked.shape[-1]))
    cut = top[..., jnp.clip(budget - 1, 0, top.shape[-1] - 1)]
    return valid & (masked >= cut) & (budget > 0)


def sample_fg_bg(key: jax.Array, is_fg: jnp.ndarray, is_bg: jnp.ndarray,
                 num_samples: int, positive_fraction: float,
                 fg_log_weights: jnp.ndarray | None = None):
    """Foreground/background balanced subsampling (d2 semantics).

    Draws up to `num_samples * positive_fraction` foreground items (optionally
    weighted, the reference's IoU-weighted multinomial) and fills the rest of
    the budget with background. Static shapes: returns two (N,) masks.

    Note: d2 fills the bg budget as `num_samples - actual_num_fg`; with few
    foregrounds the bg draw grows. We honour that by computing the bg budget
    from the realised fg count and cutting the gumbel scores at the budget-th
    largest (`rank_budget_mask` — no full sort, still static shape).
    """
    kf, kb = jax.random.split(key)
    num_fg_budget = int(num_samples * positive_fraction)
    if fg_log_weights is None:
        fg_log_weights = jnp.zeros(is_fg.shape, jnp.float32)
    fg_mask = gumbel_topk_mask(kf, fg_log_weights, is_fg, num_fg_budget)
    num_fg = jnp.sum(fg_mask)

    # background: draw `num_samples` candidates in random order, keep the
    # first (num_samples - num_fg) of them.
    g = jax.random.gumbel(kb, is_bg.shape)
    bg_budget = jnp.maximum(num_samples - num_fg, 0)
    bg_mask = rank_budget_mask(g, is_bg, bg_budget, num_samples)
    return fg_mask, bg_mask
