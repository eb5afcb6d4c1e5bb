"""Elementwise classification/regression losses, pure JAX.

Replaces torchvision `sigmoid_focal_loss` (reference roi_heads.py:10,442),
BCE/dice pieces of the segment loss (roi_heads.py:420-443), cross entropy of
the box head (fast_rcnn.py:145-194), and the reference's NaN/Inf-safe loss
reduction (`safely_reduce_losses`, roi_heads.py:1307-1315) which here becomes
an explicit masked mean — under static shapes the "bad element" filter is a
validity mask, not a boolean index.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise binary cross entropy on logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """torchvision-semantics focal loss, elementwise (no reduction)."""
    p = jax.nn.sigmoid(logits)
    ce = bce_with_logits(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def dice_loss(probs: jnp.ndarray, targets: jnp.ndarray,
              eps: float = 1.0) -> jnp.ndarray:
    """Soft dice over the last axis (flattened mask)."""
    num = 2.0 * jnp.sum(probs * targets, axis=-1) + eps
    den = jnp.sum(probs, axis=-1) + jnp.sum(targets, axis=-1) + eps
    return 1.0 - num / den


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """CE with integer labels, elementwise over the batch."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray,
                drop_nonfinite: bool = True) -> jnp.ndarray:
    """Mean of x over mask, ignoring non-finite entries.

    The static-shape analogue of the reference `safely_reduce_losses`
    (roi_heads.py:1307-1315): bad elements are masked out; if everything is
    masked the result is 0 (so a bad batch contributes nothing instead of
    NaN-ing the step — the trainer's divergence guard handles the rest).
    """
    m = mask
    if drop_nonfinite:
        m = m & jnp.isfinite(x)
    x = jnp.where(m, x, 0.0)
    denom = jnp.maximum(jnp.sum(m), 1)
    return jnp.sum(x) / denom


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.where(mask & jnp.isfinite(x), x, 0.0))
