"""Tests for pyramid / gradient ops (reference `utils_edited.py:89-147`)."""

import numpy as np
import jax.numpy as jnp

from sndepth_tpu.ops.pyramid import (downsample2x, gradient_x, gradient_y,
                                     scale_pyramid)


def test_downsample2x_is_area_mean():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 4, 6, 3).astype(np.float32)
    got = np.asarray(downsample2x(jnp.array(x)))
    want = x.reshape(2, 2, 2, 3, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_scale_pyramid_shapes():
    x = jnp.zeros((4, 128, 416, 3))
    pyr = scale_pyramid(x, 4)
    shapes = [p.shape for p in pyr]
    assert shapes == [(4, 128, 416, 3), (4, 64, 208, 3),
                      (4, 32, 104, 3), (4, 16, 52, 3)]


def test_gradients_sign_convention():
    # Reference convention: g[i] = x[i] - x[i+1] (`utils_edited.py:143-147`).
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
    gx = np.asarray(gradient_x(x))
    gy = np.asarray(gradient_y(x))
    np.testing.assert_allclose(gx, -1.0)
    np.testing.assert_allclose(gy, -4.0)
    assert gx.shape == (1, 3, 3, 1)
    assert gy.shape == (1, 2, 4, 1)
