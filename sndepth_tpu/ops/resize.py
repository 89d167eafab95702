"""Bilinear resize with align_corners=True semantics (NHWC).

The NNET decoder relies on torch ``F.interpolate(..., align_corners=True)``
(`/root/reference/submodules/decoder.py:80,105`) whose coordinate map is
``src = dst * (in - 1) / (out - 1)``. ``jax.image.resize`` implements only
half-pixel sampling, so this implements the align-corners map directly as a
separable gather along H then W — XLA fuses it into two cheap gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _interp_axis(x: Array, out_size: int, axis: int) -> Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if in_size == 1:
        reps = [1] * x.ndim
        reps[axis] = out_size
        return jnp.tile(x, reps)
    pos = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = (pos - lo.astype(jnp.float32))
    x_lo = jnp.take(x, lo, axis=axis)
    x_hi = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return x_lo * (1.0 - w) + x_hi * w


def resize_bilinear_align_corners(x: Array, out_h: int, out_w: int) -> Array:
    """x: (B, H, W, C) -> (B, out_h, out_w, C)."""
    x = _interp_axis(x, out_h, axis=1)
    return _interp_axis(x, out_w, axis=2)


def upsample2x_align_corners(x: Array) -> Array:
    return resize_bilinear_align_corners(x, 2 * x.shape[1], 2 * x.shape[2])
