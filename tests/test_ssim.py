"""Oracle tests for DSSIM / image_similarity.

Reference semantics: /root/reference/utils/utils_edited.py:121-141 — 3x3
avg pool, stride 1, zero pad, divisor always 9 (count_include_pad=True).
"""

import numpy as np
import jax.numpy as jnp

from sndepth_tpu.ops.ssim import dssim, image_similarity


def _np_avgpool3(x):
    b, h, w, c = x.shape
    padded = np.zeros((b, h + 2, w + 2, c), x.dtype)
    padded[:, 1:-1, 1:-1] = x
    out = np.zeros_like(x)
    for i in range(h):
        for j in range(w):
            out[:, i, j] = padded[:, i:i + 3, j:j + 3].sum((1, 2)) / 9.0
    return out


def _np_dssim(x, y):
    mu_x, mu_y = _np_avgpool3(x), _np_avgpool3(y)
    sx = _np_avgpool3(x * x) - mu_x ** 2
    sy = _np_avgpool3(y * y) - mu_y ** 2
    sxy = _np_avgpool3(x * y) - mu_x * mu_y
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2) /
            ((mu_x ** 2 + mu_y ** 2 + c1) * (sx + sy + c2)))
    return np.clip((1 - ssim) / 2, 0, 1)


def test_dssim_matches_oracle():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 6, 8, 3).astype(np.float32) * 2 - 1
    y = rng.rand(2, 6, 8, 3).astype(np.float32) * 2 - 1
    got = np.asarray(dssim(jnp.array(x), jnp.array(y)))
    np.testing.assert_allclose(got, _np_dssim(x, y), atol=1e-5)


def test_dssim_identical_interior_zero():
    rng = np.random.RandomState(1)
    x = rng.rand(1, 8, 8, 3).astype(np.float32)
    got = np.asarray(dssim(jnp.array(x), jnp.array(x)))
    # Interior pixels of identical images have DSSIM exactly 0.
    np.testing.assert_allclose(got[:, 2:-2, 2:-2], 0.0, atol=1e-5)


def test_image_similarity_blend():
    rng = np.random.RandomState(2)
    x = rng.rand(1, 6, 6, 3).astype(np.float32)
    y = rng.rand(1, 6, 6, 3).astype(np.float32)
    alpha = 0.85
    got = np.asarray(image_similarity(alpha, jnp.array(x), jnp.array(y)))
    want = alpha * _np_dssim(x, y) + (1 - alpha) * np.abs(x - y)
    np.testing.assert_allclose(got, want, atol=1e-5)
