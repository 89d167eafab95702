"""Pallas kernel tests (interpreter mode on CPU) vs the XLA reference."""

import numpy as np
import jax
import jax.numpy as jnp

from sndepth_tpu.kernels.dssim import dssim_pallas, image_similarity_pallas
from sndepth_tpu.ops.ssim import dssim, image_similarity


def test_dssim_kernel_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 24, 3) * 2 - 1, jnp.float32)
    y = jnp.asarray(rng.rand(2, 16, 24, 3) * 2 - 1, jnp.float32)
    got = np.asarray(dssim_pallas(x, y, True))
    want = np.asarray(dssim(x, y))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dssim_kernel_gradients_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 8, 12, 2), jnp.float32)
    y = jnp.asarray(rng.rand(1, 8, 12, 2), jnp.float32)

    g_kernel = jax.grad(lambda a, b: jnp.sum(dssim_pallas(a, b, True) ** 2),
                        argnums=(0, 1))(x, y)
    g_ref = jax.grad(lambda a, b: jnp.sum(dssim(a, b) ** 2),
                     argnums=(0, 1))(x, y)
    for gk, gr in zip(g_kernel, g_ref):
        # 2e-5: the kernel's separable pooling reassociates the 3x3 sums.
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   atol=2e-5)


def test_image_similarity_pallas():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 8, 16, 3), jnp.float32)
    y = jnp.asarray(rng.rand(1, 8, 16, 3), jnp.float32)
    got = np.asarray(image_similarity_pallas(0.85, x, y, True))
    want = np.asarray(image_similarity(0.85, x, y))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dssim_bwd_kernel_tie_cases():
    # x == y patches drive DSSIM exactly to the 0 clip boundary, where
    # jnp.clip autodiff passes gradient 0.5 — the fused adjoint kernel
    # must reproduce that tie-splitting exactly.
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 10, 14, 2), jnp.float32)
    y = x.at[:, 5:, :, :].set(jnp.asarray(rng.rand(1, 5, 14, 2)))

    wgt = jnp.asarray(rng.rand(1, 10, 14, 2), jnp.float32)

    def loss(fn, a, b):
        return jnp.sum(fn(a, b) * wgt)

    g_k = jax.grad(lambda a, b: loss(
        lambda u, v: dssim_pallas(u, v, True), a, b), argnums=(0, 1))(x, y)
    g_r = jax.grad(lambda a, b: loss(dssim, a, b), argnums=(0, 1))(x, y)
    for gk, gr in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   atol=2e-5)


def test_dssim_bwd_kernel_random_grads():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 9, 21, 3) * 2 - 1, jnp.float32)
    y = jnp.asarray(rng.rand(2, 9, 21, 3) * 2 - 1, jnp.float32)
    g = jnp.asarray(rng.rand(2, 9, 21, 3), jnp.float32)

    g_k = jax.grad(lambda a, b: jnp.sum(dssim_pallas(a, b, True) * g),
                   argnums=(0, 1))(x, y)
    g_r = jax.grad(lambda a, b: jnp.sum(dssim(a, b) * g),
                   argnums=(0, 1))(x, y)
    for gk, gr in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   atol=2e-5)
