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
import optax

Array = jax.Array


def cross_entropy(logits: Array, labels: Array,
                  class_weights: Array | None = None) -> Array:
    """logits: (..., C) float; labels: (...,) int."""
    per_pixel = optax.softmax_cross_entropy_with_integer_labels(
        logits, labels)
    if class_weights is None:
        return jnp.mean(per_pixel)
    w = jnp.asarray(class_weights, per_pixel.dtype)[labels]
    return jnp.sum(per_pixel * w) / jnp.maximum(jnp.sum(w), 1e-12)


def weighted_motion_ce(logits: Array, labels: Array) -> Array:
    """Background-ignoring CE (weights [0, 1, 1])."""
    return cross_entropy(logits, labels, jnp.array([0.0, 1.0, 1.0]))
