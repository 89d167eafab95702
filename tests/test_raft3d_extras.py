"""Tests: grid smoother (CG vs dense solve oracle), augmentors, datasets,
bilaplacian RAFT3D variant."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sndepth_tpu.data.raft3d_augment import (RGBDAugmentor, SparseAugmentor,
                                             color_jitter,
                                             resize_sparse_image)
from sndepth_tpu.models.grid_smoother import grid_solve


def _dense_solve(ae, wx, wy):
    """Build the screened-Laplacian system densely and solve (oracle)."""
    b, h, w, c = ae.shape
    n = h * w
    out = np.zeros_like(ae)
    for bi in range(b):
        A = np.eye(n)
        for i in range(h):
            for j in range(w):
                idx = i * w + j
                if j + 1 < w:
                    wgt = wx[bi, i, j, 0]
                    for (a, bb) in ((idx, idx), (idx, idx + 1),
                                    (idx + 1, idx), (idx + 1, idx + 1)):
                        A[a, bb] += wgt if a == bb else -wgt
                if i + 1 < h:
                    wgt = wy[bi, i, j, 0]
                    for (a, bb) in ((idx, idx), (idx, idx + w),
                                    (idx + w, idx), (idx + w, idx + w)):
                        A[a, bb] += wgt if a == bb else -wgt
        for ci in range(c):
            rhs = ae[bi, :, :, ci].reshape(-1)
            out[bi, :, :, ci] = np.linalg.solve(A, rhs).reshape(h, w)
    return out


def test_grid_solve_matches_dense_oracle():
    rng = np.random.RandomState(0)
    ae = rng.randn(1, 5, 6, 2).astype(np.float32)
    wx = rng.rand(1, 5, 6, 1).astype(np.float32)
    wy = rng.rand(1, 5, 6, 1).astype(np.float32)
    got = np.asarray(grid_solve(jnp.array(ae), jnp.array(wx),
                                jnp.array(wy), iters=60))
    want = _dense_solve(ae, wx, wy)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_grid_solve_zero_weights_identity():
    rng = np.random.RandomState(1)
    ae = jnp.asarray(rng.randn(1, 4, 4, 3), jnp.float32)
    zeros = jnp.zeros((1, 4, 4, 1))
    out = np.asarray(grid_solve(ae, zeros, zeros, iters=8))
    np.testing.assert_allclose(out, np.asarray(ae), atol=1e-5)


def test_grid_solve_high_weights_smooth():
    ae = jnp.asarray(np.random.RandomState(2).randn(1, 6, 6, 1),
                     jnp.float32)
    big = jnp.full((1, 6, 6, 1), 100.0)
    out = np.asarray(grid_solve(ae, big, big, iters=100))
    # strong smoothing -> nearly constant = mean of ae
    assert out.std() < 0.05 * np.asarray(ae).std()
    np.testing.assert_allclose(out.mean(), np.asarray(ae).mean(), atol=1e-3)


def test_color_jitter_range_and_variation():
    rng = np.random.RandomState(3)
    img = rng.rand(8, 8, 3).astype(np.float32)
    out = color_jitter(rng, img)
    assert out.min() >= 0 and out.max() <= 1
    assert not np.allclose(out, img)


def test_resize_sparse_image():
    data = np.zeros((4, 4, 3), np.float32)
    valid = np.zeros((4, 4), np.float32)
    data[2, 2] = [1.0, 2.0, 3.0]
    valid[2, 2] = 1.0
    out, out_valid = resize_sparse_image(data, valid, 8, 8)
    ys, xs = np.nonzero(out_valid)
    assert len(ys) == 1 and ys[0] == 4 and xs[0] == 4
    np.testing.assert_allclose(out[4, 4], [1, 2, 3])


def test_rgbd_augmentor_shapes():
    aug = RGBDAugmentor((32, 48), seed=0)
    rng = np.random.RandomState(0)
    img = rng.rand(48, 64, 3).astype(np.float32) * 255
    depth = rng.rand(48, 64).astype(np.float32) + 1
    flow = rng.randn(48, 64, 3).astype(np.float32)
    k = np.array([100.0, 100.0, 32.0, 24.0], np.float32)
    i1, i2, d1, d2, f, k2 = aug(img, img.copy(), depth, depth.copy(),
                                flow, k)
    assert i1.shape == (32, 48, 3)
    assert d1.shape == (32, 48)
    assert f.shape == (32, 48, 3)
    assert k2.shape == (4,)


def test_sparse_augmentor_shapes():
    aug = SparseAugmentor((32, 48), seed=0)
    rng = np.random.RandomState(0)
    img = rng.rand(48, 64, 3).astype(np.float32) * 255
    depth = rng.rand(48, 64).astype(np.float32) + 1
    flow = rng.randn(48, 64, 3).astype(np.float32)
    valid = (rng.rand(48, 64) > 0.5).astype(np.float32)
    k = np.array([100.0, 100.0, 32.0, 24.0], np.float32)
    i1, i2, d1, d2, f, v, k2 = aug(img, img.copy(), depth, depth.copy(),
                                   flow, valid, k)
    assert i1.shape == (32, 48, 3)
    assert v.shape == (32, 48)
    assert set(np.unique(v)) <= {0.0, 1.0}


@pytest.mark.slow
def test_bilaplacian_raft3d_smoke():
    from sndepth_tpu.models.raft3d import RAFT3D
    b, h, w = 1, 32, 64
    rng = np.random.RandomState(6)
    img = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    depth = jnp.asarray(2.0 + rng.rand(b, h, w), jnp.float32)
    k = jnp.array([[40.0, 40.0, 32.0, 16.0]])
    model = RAFT3D(corr_levels=2, gn_radius=8, bilaplacian=True)
    variables = model.init(jax.random.PRNGKey(0), img, img, depth, depth,
                           k, iters=1)
    Ts = model.apply(variables, img, img, depth, depth, k, iters=2)
    assert Ts.shape == (b, h, w, 7)
    assert np.isfinite(np.asarray(Ts)).all()


@pytest.mark.slow
def test_raft2d_smoke():
    from sndepth_tpu.models.raft2d import RAFT2D
    rng = np.random.RandomState(7)
    b, h, w = 1, 32, 64
    img1 = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    img2 = jnp.asarray(np.roll(np.asarray(img1), 2, axis=2))
    model = RAFT2D(corr_levels=2)
    variables = model.init(jax.random.PRNGKey(0), img1, img2, iters=1)
    flow = model.apply(variables, img1, img2, iters=2)
    assert flow.shape == (b, h, w, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_gauss_newton_blocked_matches_single_shot():
    # Blocked j-accumulation (the full-resolution path) must match the
    # single-shot O(N^2) form; block size deliberately non-dividing.
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sndepth_tpu.models.raft3d import gauss_newton_step
    from sndepth_tpu.ops import se3

    rng = np.random.RandomState(0)
    b, h, w = 1, 6, 9
    Ts = se3.exp(jnp.asarray(rng.randn(b, h, w, 6) * 0.01, jnp.float32))
    ae = jnp.asarray(rng.randn(b, h, w, 16), jnp.float32)
    target = jnp.asarray(rng.rand(b, h, w, 3) * 4, jnp.float32)
    weight = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    depth = jnp.asarray(1.0 + rng.rand(b, h, w) * 3, jnp.float32)
    intr = jnp.asarray([[40.0, 42.0, 4.5, 3.0]], jnp.float32)

    full = gauss_newton_step(Ts, ae, target, weight, depth, intr,
                             radius=4, block_size=h * w)
    blocked = gauss_newton_step(Ts, ae, target, weight, depth, intr,
                                radius=4, block_size=16)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(full),
                               atol=2e-5)
    assert np.isfinite(np.asarray(blocked)).all()


def test_raft3d_bf16_encoders_finite():
    """RAFT3D(dtype=bf16): encoders/GRU in bf16, corr/GN/SE3 still f32 —
    outputs stay finite and close to the f32 run on a tiny problem."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sndepth_tpu.models.raft3d import RAFT3D

    rng = np.random.RandomState(0)
    b, h, w = 1, 32, 64
    img1 = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    img2 = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    d = jnp.asarray(2 + rng.rand(b, h, w), jnp.float32)
    k = jnp.asarray([[40.0, 40.0, 32.0, 16.0]])

    f32 = RAFT3D(corr_levels=2, gn_radius=8, dtype=jnp.float32)
    v = f32.init(jax.random.PRNGKey(0), img1, img2, d, d, k, iters=1)
    out32 = f32.apply(v, img1, img2, d, d, k, iters=2)
    bf16 = RAFT3D(corr_levels=2, gn_radius=8, dtype=jnp.bfloat16)
    out16 = bf16.apply(v, img1, img2, d, d, k, iters=2)
    assert np.isfinite(np.asarray(out16)).all()
    # same params, reduced precision: fields should still be close
    diff = np.abs(np.asarray(out16) - np.asarray(out32)).mean()
    assert diff < 0.05, diff


@pytest.mark.slow
def test_kitti_submission_cli_data_parallel(tmp_path):
    """--data_parallel shards frame chunks over the 8-device mesh and
    writes the same artifacts as the single-device path."""
    import os

    import jax
    import numpy as np
    from PIL import Image

    from sndepth_tpu.cli.kitti_submission import main

    seq = tmp_path / "testing" / "seq"
    cal = tmp_path / "testing" / "calib_cam_to_cam"
    seq.mkdir(parents=True)
    cal.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (64, 96, 3), np.uint8)).save(
            seq / f"{i:06d}.png")
        (cal / f"{i:06d}.txt").write_text(
            "K_02: 50.0 0.0 48.0 0.0 50.0 32.0 0.0 0.0 1.0\n")

    common = ["--root", str(tmp_path), "--iters", "2",
              "--img_height", "32", "--img_width", "64"]
    main(common + ["--out_dir", str(tmp_path / "o1")])
    main(common + ["--out_dir", str(tmp_path / "odp"), "--data_parallel"])
    for sub in ("flow", "T", "tau", "phi"):
        a = sorted(os.listdir(tmp_path / "o1" / sub))
        b = sorted(os.listdir(tmp_path / "odp" / sub))
        assert a == b and len(a) == 3, (sub, a, b)
    t1 = np.loadtxt(tmp_path / "o1" / "T" / "000001.txt")
    t2 = np.loadtxt(tmp_path / "odp" / "T" / "000001.txt")
    np.testing.assert_allclose(t2, t1, rtol=1e-4, atol=1e-5)
