"""Align-corners bilinear resize: MXU banded-matmul form vs gather form
vs torch F.interpolate(align_corners=True)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sndepth_tpu.ops.resize import (_interp_axis_gather,
                                    resize_bilinear_align_corners,
                                    upsample2x_align_corners)


def _gather_resize(x, oh, ow):
    return _interp_axis_gather(_interp_axis_gather(x, oh, 1), ow, 2)


def test_matmul_form_matches_gather_form():
    rng = np.random.RandomState(0)
    for (h, w, oh, ow) in ((240, 320, 480, 640), (17, 33, 64, 96),
                           (64, 96, 31, 45), (30, 46, 60, 92)):
        x = jnp.asarray(rng.randn(2, h, w, 5), jnp.float32)
        got = resize_bilinear_align_corners(x, oh, ow)
        want = _gather_resize(x, oh, ow)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-6)


def test_matches_torch_align_corners():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 24, 36).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(53, 77),
                         mode="bilinear", align_corners=True).numpy()
    got = np.asarray(resize_bilinear_align_corners(
        jnp.asarray(x.transpose(0, 2, 3, 1)), 53, 77)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_tiny_axis_and_identity_paths():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 130, 2), jnp.float32)  # h below matmul cut
    out = resize_bilinear_align_corners(x, 8, 260)
    want = _gather_resize(x, 8, 260)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=5e-6)
    same = resize_bilinear_align_corners(x, 4, 130)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(x))
    up = upsample2x_align_corners(x)
    assert up.shape == (1, 8, 260, 2)


def test_grad_flows_through_matmul_form():
    import jax
    x = jnp.ones((1, 32, 32, 2))
    g = jax.grad(lambda a: jnp.sum(
        resize_bilinear_align_corners(a, 64, 64) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
