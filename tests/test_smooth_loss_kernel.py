"""Fused smoothness-loss kernel vs the split XLA ops (interpreter)."""

import numpy as np
import jax
import jax.numpy as jnp

from sndepth_tpu.kernels import smooth_loss as sk
from sndepth_tpu.losses import photometric


def _split_ref(depth, image):
    from sndepth_tpu.ops.pyramid import gradient_x, gradient_y
    wx = jnp.exp(-jnp.mean(jnp.abs(gradient_x(image)), 3, keepdims=True))
    wy = jnp.exp(-jnp.mean(jnp.abs(gradient_y(image)), 3, keepdims=True))
    return (jnp.mean(jnp.abs(gradient_x(depth) * wx)) +
            jnp.mean(jnp.abs(gradient_y(depth) * wy)))


def _case(seed, b=3, h=16, w=52):
    rng = np.random.RandomState(seed)
    depth = jnp.asarray(rng.rand(b, h, w, 1) * 5 + 0.1, jnp.float32)
    image = jnp.asarray(rng.rand(b, h, w, 3) * 2 - 1, jnp.float32)
    return depth, image


def test_value_matches_split():
    depth, image = _case(0)
    got = float(sk.smooth_loss_fused(depth, image))
    want = float(_split_ref(depth, image))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_depth_gradient_matches_split():
    depth, image = _case(1)
    g_f = jax.grad(lambda d: 0.53 * sk.smooth_loss_fused(d, image))(depth)
    g_r = jax.grad(lambda d: 0.53 * _split_ref(d, image))(depth)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               atol=1e-5, rtol=1e-4)


def test_dispatch_in_smooth_loss(monkeypatch):
    depth, image = _case(2, b=1, h=8, w=130)   # lane-padded width
    monkeypatch.setattr(sk, "_BACKEND", "fused")
    got = float(photometric.smooth_loss(depth, image))
    want = float(_split_ref(depth, image))
    np.testing.assert_allclose(got, want, rtol=2e-5)
    g_f = jax.grad(lambda d: photometric.smooth_loss(d, image))(depth)
    g_r = jax.grad(lambda d: _split_ref(d, image))(depth)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               atol=1e-5, rtol=1e-4)
