"""Oracle tests for the bilinear sampler / flow warp.

Reference semantics: /root/reference/utils/utils_edited.py:386-486 — border
indices are clamped and weights built from the clamped indices, which makes
far-out-of-bounds samples exactly 0.
"""

import numpy as np
import jax.numpy as jnp

from sndepth_tpu.ops.warp import bilinear_sampler, flow_warp


def _np_bilinear(imgs, coords):
    b, hs, ws, c = imgs.shape
    out = np.zeros(coords.shape[:3] + (c,), np.float32)
    for bi in range(b):
        for i in range(coords.shape[1]):
            for j in range(coords.shape[2]):
                x, y = coords[bi, i, j]
                x0, y0 = np.floor(x), np.floor(y)
                x1, y1 = x0 + 1, y0 + 1
                x0s, x1s = np.clip([x0, x1], 0, ws - 1)
                y0s, y1s = np.clip([y0, y1], 0, hs - 1)
                w00 = (x1s - x) * (y1s - y)
                w01 = (x1s - x) * (y - y0s)
                w10 = (x - x0s) * (y1s - y)
                w11 = (x - x0s) * (y - y0s)
                out[bi, i, j] = (
                    w00 * imgs[bi, int(y0s), int(x0s)] +
                    w01 * imgs[bi, int(y1s), int(x0s)] +
                    w10 * imgs[bi, int(y0s), int(x1s)] +
                    w11 * imgs[bi, int(y1s), int(x1s)])
    return out


def test_sampler_matches_oracle_random_coords():
    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 6, 7, 3).astype(np.float32)
    # Coordinates spanning in-bounds, border, and far out-of-bounds.
    coords = rng.uniform(-3, 10, (2, 4, 5, 2)).astype(np.float32)
    got = np.asarray(bilinear_sampler(jnp.array(imgs), jnp.array(coords)))
    want = _np_bilinear(imgs, coords)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sampler_identity_at_integer_coords_interior():
    # Reference border quirk (`utils_edited.py:444-452`): at x == W-1 the
    # clamped x1 collapses onto x0 and both weights become 0, so the exact
    # right/bottom border rows sample to 0 even for identity coords.
    # Identity therefore holds only on the interior.
    rng = np.random.RandomState(1)
    imgs = rng.rand(1, 5, 5, 2).astype(np.float32)
    ys, xs = np.mgrid[0:5, 0:5]
    coords = np.stack([xs, ys], -1)[None].astype(np.float32)
    got = np.asarray(bilinear_sampler(jnp.array(imgs), jnp.array(coords)))
    np.testing.assert_allclose(got[:, :4, :4], imgs[:, :4, :4], atol=1e-6)
    np.testing.assert_allclose(got[:, 4, :], 0.0, atol=1e-6)
    np.testing.assert_allclose(got[:, :, 4], 0.0, atol=1e-6)


def test_sampler_zero_far_outside():
    imgs = jnp.ones((1, 4, 4, 1))
    coords = jnp.array([[[[-5.0, -5.0], [10.0, 10.0], [-2.0, 2.0]]]])
    got = np.asarray(bilinear_sampler(imgs, coords))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_flow_warp_zero_flow_is_identity_interior():
    rng = np.random.RandomState(2)
    img = rng.rand(2, 8, 8, 3).astype(np.float32)
    flow = np.zeros((2, 8, 8, 2), np.float32)
    got = np.asarray(flow_warp(jnp.array(img), jnp.array(flow)))
    # Interior identity; border rows/cols are zeroed (see identity test).
    np.testing.assert_allclose(got[:, :7, :7], img[:, :7, :7], atol=1e-6)


def test_flow_warp_integer_shift():
    img = np.zeros((1, 4, 6, 1), np.float32)
    img[0, 1, 2, 0] = 1.0
    # flow of (+1, 0) everywhere: output[i, j] = img[i, j+1]
    flow = np.zeros((1, 4, 6, 2), np.float32)
    flow[..., 0] = 1.0
    got = np.asarray(flow_warp(jnp.array(img), jnp.array(flow)))
    want = np.zeros_like(img)
    want[0, 1, 1, 0] = 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pallas_gate_excludes_many_channel_feature_maps():
    """Feature-map warps (e.g. DCNv2 at 256 ch) must stay on XLA: the
    kernel's per-step output blocks scale with nch and blew the scoped
    VMEM stack at UniAD reference scale."""
    import numpy as np
    from sndepth_tpu.ops import warp as W
    imgs = jnp.zeros((1, 64, 64, 256))
    coords = jnp.zeros((1, 64, 64, 2))
    assert not W._use_pallas(imgs, coords)
    # 32-channel (deformable-attention head_dim) must NOT be excluded:
    # its pallas path is load-bearing at UniAD reference scale.
    import jax
    if jax.default_backend() in ("tpu", "axon"):
        assert W._use_pallas(jnp.zeros((1, 64, 64, 32)), coords)
