"""Dilated patch extraction (the `tf.extract_image_patches` / `F.unfold`
equivalent), NHWC.

The reference's D2N/N2D modules unfold k=9, dilation=4 patches of normals
and 3-D points (`/root/reference/models/baseline.py:357-402,496-500`).
NOTE: the reference applies ``F.unfold`` to an NHWC-permuted tensor, so the
channel axis it actually unfolds over is H — a silent layout bug inherited
from the TF->torch port. This implementation does what the code *intends*
(patches over the spatial dims of an NHWC map); the divergence is
deliberate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def extract_patches_tap_last(x: Array, k: int, dilation: int) -> Array:
    """x: (B, H, W, C) -> (B, H, W, C, k*k), SAME-padded, stride 1.

    Tap order is row-major over the kxk window. This is the TPU-preferred
    layout: the k*k tap axis (81 for k=9) sits in lanes; the alternative
    (..., k*k, C) with C=3 lane-pads 3 -> 128 (a ~40x memory blowup that
    dominated the NNET D2N/N2D stage).
    """
    b, h, w, c = x.shape
    span = k + (k - 1) * (dilation - 1)
    pad = (span - 1) // 2
    patches = lax.conv_general_dilated_patches(
        x, filter_shape=(k, k), window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)], rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # conv_general_dilated_patches emits channels ordered (C, k, k).
    return patches.reshape(b, h, w, c, k * k)


def extract_patches(x: Array, k: int, dilation: int) -> Array:
    """x: (B, H, W, C) -> (B, H, W, k*k, C). Prefer
    :func:`extract_patches_tap_last` in hot paths (layout note there)."""
    return jnp.swapaxes(extract_patches_tap_last(x, k, dilation), -1, -2)
