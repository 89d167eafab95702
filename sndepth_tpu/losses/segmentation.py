"""Segmentation losses.

* Plain cross-entropy over (B, H, W, C) logits — the reference's training
  loss (`/root/reference/train.py:20,30`).
* Class-weighted variant with weights [0, 1, 1] that ignores the background
  class (`/root/reference/utils/motion_split/loss_func.py:4-10`). Like torch
  ``CrossEntropyLoss(weight=w)``, the mean is normalized by the summed
  weights of the targets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def cross_entropy(logits: Array, labels: Array,
                  class_weights: Array | None = None) -> Array:
    """logits: (..., C) float; labels: (...,) int.

    One-hot contraction form: ``take_along_axis(log_probs, labels)`` (what
    optax's integer-label CE does) lowers on TPU to a one-element-per-row
    general gather — XProf showed it as a single 72 ms/step fusion in the
    motion train step (4.7M rows at batch 16). ``sum(logits * one_hot)``
    is elementwise + a small-axis reduce and fuses into the producers;
    same value to f32 rounding."""
    logits = logits.astype(jnp.float32)
    c = logits.shape[-1]
    oh = jax.nn.one_hot(labels, c, dtype=logits.dtype)
    log_z = jax.scipy.special.logsumexp(logits, axis=-1)
    per_pixel = log_z - jnp.sum(logits * oh, axis=-1)
    if class_weights is None:
        return jnp.mean(per_pixel)
    w = jnp.sum(oh * jnp.asarray(class_weights, logits.dtype), axis=-1)
    return jnp.sum(per_pixel * w) / jnp.maximum(jnp.sum(w), 1e-12)


def weighted_motion_ce(logits: Array, labels: Array) -> Array:
    """Background-ignoring CE (weights [0, 1, 1])."""
    return cross_entropy(logits, labels, jnp.array([0.0, 1.0, 1.0]))
