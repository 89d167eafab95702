"""Bilinear resize with align_corners=True semantics (NHWC).

The NNET decoder relies on torch ``F.interpolate(..., align_corners=True)``
(`/root/reference/submodules/decoder.py:80,105`) whose coordinate map is
``src = dst * (in - 1) / (out - 1)``. ``jax.image.resize`` implements only
half-pixel sampling, so this implements the align-corners map directly.

TPU-first form: the separable interpolation is expressed as two banded
weight-matrix contractions ``out = R @ x @ C^T`` (one (out, in) matrix per
axis, two non-zeros per row) that run on the MXU. The obvious
gather-then-blend form lowers to general gathers plus layout copies — an
XProf of the NNET train step showed ~40 ms/step of exactly those (e.g. a
(4,480,320,128) -> (640,4,480,128) w-axis gather + four 6 ms transposed
copies), while the matmul form is <1 ms for the same shapes. The dense
matrices waste FLOPs on the zero band, but the MXU eats ~100x the
gather path's effective throughput. Weight matrices are compile-time
constants (numpy), so XLA folds and reuses them.

The gather form is kept for tiny axes (matmul setup not worth it) and as
a reference for the exactness test.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array

# Below this input-axis size the banded matmul is not worth it (the MXU
# pass would be padding-dominated); the gather form is fine there.
_MATMUL_MIN_AXIS = 16


def _weight_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) align-corners interpolation matrix, two taps per row."""
    # f32 arithmetic in the same op order as the gather form (and torch's
    # f32 kernel) so both paths round identically.
    pos = (np.arange(out_size, dtype=np.float32) * np.float32(in_size - 1)
           / np.float32(out_size - 1))
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w = pos - lo.astype(np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    m[rows, lo] = (1.0 - w).astype(np.float32)
    m[rows, hi] += w.astype(np.float32)
    return m


def _interp_axis_gather(x: Array, out_size: int, axis: int) -> Array:
    in_size = x.shape[axis]
    pos = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = (pos - lo.astype(jnp.float32))
    x_lo = jnp.take(x, lo, axis=axis)
    x_hi = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape).astype(x.dtype)
    return x_lo * (1.0 - w) + x_hi * w


def _interp_axis(x: Array, out_size: int, axis: int) -> Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if in_size == 1:
        reps = [1] * x.ndim
        reps[axis] = out_size
        return jnp.tile(x, reps)
    if in_size < _MATMUL_MIN_AXIS:
        return _interp_axis_gather(x, out_size, axis)
    m = jnp.asarray(_weight_matrix(in_size, out_size), x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    out = jax.lax.dot_general(
        moved, m, (((moved.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.moveaxis(out, -1, axis)


def resize_bilinear_align_corners(x: Array, out_h: int, out_w: int) -> Array:
    """x: (B, H, W, C) -> (B, out_h, out_w, C)."""
    x = _interp_axis(x, out_h, axis=1)
    return _interp_axis(x, out_w, axis=2)


def upsample2x_align_corners(x: Array) -> Array:
    return resize_bilinear_align_corners(x, 2 * x.shape[1], 2 * x.shape[2])
