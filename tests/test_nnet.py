"""Tests for the NNET normal stack: patches, canny, D2N/N2D oracles,
encoder/decoder shapes, full pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sndepth_tpu.models import nnet as nnet_lib
from sndepth_tpu.models.efficientnet import EfficientNetEncoder
from sndepth_tpu.models.normal_decoder import (NormalDecoder, norm_normalize,
                                               sample_points)
from sndepth_tpu.ops.edges import canny_edges, propagate
from sndepth_tpu.ops.patches import extract_patches


def test_extract_patches_matches_oracle():
    rng = np.random.RandomState(0)
    x = rng.rand(1, 8, 9, 2).astype(np.float32)
    k, d = 3, 2
    got = np.asarray(extract_patches(jnp.array(x), k, d))
    assert got.shape == (1, 8, 9, 9, 2)
    span = k + (k - 1) * (d - 1)
    pad = (span - 1) // 2
    xp = np.zeros((1, 8 + 2 * pad, 9 + 2 * pad, 2), np.float32)
    xp[:, pad:-pad, pad:-pad] = x
    for i in range(8):
        for j in range(9):
            taps = []
            for di in range(k):
                for dj in range(k):
                    taps.append(xp[0, i + di * d, j + dj * d])
            np.testing.assert_allclose(got[0, i, j], np.stack(taps),
                                       atol=1e-6)


def test_norm_normalize():
    x = jnp.array([[3.0, 4.0, 0.0, -0.5]])
    out = np.asarray(norm_normalize(x))
    np.testing.assert_allclose(np.linalg.norm(out[0, :3]), 1.0, atol=1e-6)
    # kappa = elu(-0.5) + 1 + 0.01 > 0.01
    assert out[0, 3] > 0.01


def test_sample_points_counts_and_uniqueness():
    rng = jax.random.PRNGKey(0)
    b, h, w = 2, 16, 20
    init = jax.random.normal(rng, (b, h, w, 4))
    rows, cols = sample_points(rng, init, None, 0.4, 0.7)
    n = int(0.4 * h * w)
    assert rows.shape == (b, n) and cols.shape == (b, n)
    flat = np.asarray(rows * w + cols)
    for i in range(b):
        assert len(set(flat[i].tolist())) == n   # no duplicate samples
    # Importance samples are the lowest-kappa points.
    n_imp = int(0.7 * n)
    kappa = np.asarray(init[..., 3].reshape(b, -1))
    worst = set(np.argsort(-(-kappa[0]))[:n_imp].tolist())
    got_imp = set(flat[0][:n_imp].tolist())
    assert got_imp == set(np.argsort(kappa[0])[:n_imp].tolist()) or \
        got_imp <= set(np.argsort(kappa[0])[:n_imp + 5].tolist())


def test_sample_points_approx_backend(monkeypatch):
    """The approx (TPU) sampling backend keeps the contract: n unique
    in-range samples, importance set biased to the lowest-kappa points."""
    from sndepth_tpu.models import normal_decoder as nd
    monkeypatch.setattr(nd, "_SAMPLE", "approx")
    rng = jax.random.PRNGKey(3)
    b, h, w = 2, 16, 20
    init = jax.random.normal(rng, (b, h, w, 4))
    rows, cols = nd.sample_points(rng, init, None, 0.4, 0.7)
    n = int(0.4 * h * w)
    n_imp = int(0.7 * n)
    assert rows.shape == (b, n) and cols.shape == (b, n)
    flat = np.asarray(rows * w + cols)
    assert (flat >= 0).all() and (flat < h * w).all()
    for i in range(b):
        assert len(set(flat[i].tolist())) == n   # no duplicate samples
    # Importance samples skew low-kappa: their mean uncertainty rank
    # beats the population median clearly.
    kappa = np.asarray(init[..., 3].reshape(b, -1))
    ranks = np.argsort(np.argsort(kappa[0]))     # 0 = lowest kappa
    assert ranks[flat[0][:n_imp]].mean() < 0.25 * h * w


def test_d2n_recovers_plane_normal():
    # Points on the plane n.x = const have LS normal parallel to n.
    # k=9 dil=4 patches span +-16 px, so use a 48x64 image and a 17-px
    # interior margin for the pad-free assertions.
    b, h, w, m = 1, 48, 64, 17
    grid = np.asarray(nnet_lib.camera_grid(b, h, w))
    true_n = np.array([0.3, -0.2, 0.93])
    true_n /= np.linalg.norm(true_n)
    # depth so that points lie on plane n.(grid*z) = 1 -> z = 1/(n.grid)
    z = 1.0 / np.einsum("bhwc,c->bhw", grid, true_n)
    points = grid * z[..., None]
    pre_norm = np.broadcast_to(true_n, (b, h, w, 3)).astype(np.float32)
    norm10, angle, _ = nnet_lib.d2n_least_squares(
        jnp.array(pre_norm), jnp.array(points, dtype=jnp.float32))
    est = np.asarray(norm10) / 10.0
    interior = est[:, m:-m, m:-m]
    dots = np.einsum("bhwc,c->bhw", interior, true_n)
    np.testing.assert_allclose(np.abs(dots), 1.0, atol=1e-3)
    # all interior taps agree with the normal -> angle == 1
    np.testing.assert_allclose(np.asarray(angle)[:, m:-m, m:-m], 1.0,
                               atol=1e-5)


def test_n2d_recovers_plane_depth():
    b, h, w, m = 1, 48, 64, 17
    grid = np.asarray(nnet_lib.camera_grid(b, h, w))
    true_n = np.array([0.1, 0.2, 0.97])
    true_n /= np.linalg.norm(true_n)
    z = 1.0 / np.einsum("bhwc,c->bhw", grid, true_n)
    points = (grid * z[..., None]).astype(np.float32)
    pre_norm = np.broadcast_to(true_n, (b, h, w, 3)).astype(np.float32)
    from sndepth_tpu.ops.patches import extract_patches_tap_last as ep
    point_patches = ep(jnp.array(points), 9, 4)
    angle = jnp.einsum("bhwct,bhwc->bhwt",
                       ep(jnp.array(pre_norm), 9, 4), jnp.array(pre_norm))
    depth = np.asarray(nnet_lib.n2d_depth(
        jnp.array(pre_norm), jnp.array(grid, dtype=jnp.float32), angle,
        point_patches))
    np.testing.assert_allclose(depth[0, m:-m, m:-m, 0], z[0, m:-m, m:-m],
                               rtol=2e-2)


def test_canny_detects_step_edge():
    img = np.zeros((1, 32, 32, 3), np.float32)
    img[:, :, 16:] = 200.0
    out = np.asarray(canny_edges(jnp.array(img)))
    assert out.shape == (1, 32, 32, 1)
    # Edge column ~0, flat regions ~1.
    assert out[0, 16, 16, 0] < 0.5 or out[0, 16, 15, 0] < 0.5
    assert out[0, 16, 4, 0] == 1.0
    assert out[0, 16, 28, 0] == 1.0


def test_propagate_shift_blend():
    data = jnp.arange(6, dtype=jnp.float32).reshape(1, 2, 3, 1)
    ones = jnp.ones((1, 2, 3, 1))
    zeros = jnp.zeros((1, 2, 3, 1))
    # full left->right propagation only: out = right-shifted data (0 pad).
    out = np.asarray(propagate(data, ones, zeros, zeros, zeros))
    want = np.array([[[0, 0, 1], [0, 3, 4]]], np.float32)[..., None]
    np.testing.assert_allclose(out, want)


@pytest.mark.slow
def test_encoder_feature_shapes():
    enc = EfficientNetEncoder()
    x = jnp.zeros((1, 64, 96, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    assert feats["stage0"].shape == (1, 32, 48, 24)
    assert feats["stage1"].shape == (1, 16, 24, 40)
    assert feats["stage2"].shape == (1, 8, 12, 64)
    assert feats["stage4"].shape == (1, 4, 6, 176)
    assert feats["head"].shape == (1, 2, 3, 2048)


@pytest.mark.slow
def test_decoder_test_and_train_paths():
    h, w = 64, 96
    key = jax.random.PRNGKey(42)
    ks = jax.random.split(key, 5)
    feats = {
        "stage0": jax.random.normal(ks[0], (1, h // 2, w // 2, 24)),
        "stage1": jax.random.normal(ks[1], (1, h // 4, w // 4, 40)),
        "stage2": jax.random.normal(ks[2], (1, h // 8, w // 8, 64)),
        "stage4": jax.random.normal(ks[3], (1, h // 16, w // 16, 176)),
        "head": jax.random.normal(ks[4], (1, h // 32, w // 32, 2048)),
    }
    dec = NormalDecoder()
    rng = jax.random.PRNGKey(0)
    variables = dec.init(rng, feats, mode="test")
    outs, _, _ = dec.apply(variables, feats, mode="test")
    assert [o.shape for o in outs] == [
        (1, h // 8, w // 8, 4), (1, h // 4, w // 4, 4),
        (1, h // 2, w // 2, 4), (1, h, w, 4)]
    for o in outs:
        norms = np.linalg.norm(np.asarray(o)[..., :3], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    dec_g = NormalDecoder(dense_refine=False)
    outs_t, sampled, idx = dec_g.apply(variables, feats, mode="train",
                                       rng=jax.random.PRNGKey(1))
    assert sampled[1].shape[1] == int(0.4 * (h // 4) * (w // 4))
    assert idx[1][0].shape == sampled[1].shape[:2]


def test_decoder_dense_refine_matches_gather_form():
    """dense_refine (TPU-first masked-dense train path) must equal the
    reference's gather -> point MLP -> scatter form: identical output
    maps, identical loss, identical parameter gradients."""
    from sndepth_tpu.losses.normal_loss import decoder_multi_scale_loss

    h, w = 64, 96
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 7)
    feats = {
        "stage0": jax.random.normal(ks[0], (2, h // 2, w // 2, 24)),
        "stage1": jax.random.normal(ks[1], (2, h // 4, w // 4, 40)),
        "stage2": jax.random.normal(ks[2], (2, h // 8, w // 8, 64)),
        "stage4": jax.random.normal(ks[3], (2, h // 16, w // 16, 176)),
        "head": jax.random.normal(ks[4], (2, h // 32, w // 32, 2048)),
    }
    gt = jax.random.normal(ks[5], (2, h, w, 3))
    gt = gt / jnp.linalg.norm(gt, axis=-1, keepdims=True)
    gt_mask = (jax.random.uniform(ks[6], (2, h, w, 1)) > 0.2)

    variables = NormalDecoder().init(jax.random.PRNGKey(0), feats,
                                     mode="test")
    srng = jax.random.PRNGKey(3)

    def run(dense):
        def loss_fn(params):
            outs, sampled, idx = NormalDecoder(dense_refine=dense).apply(
                {"params": params}, feats, mode="train",
                gt_norm_mask=gt_mask, rng=srng)
            loss = decoder_multi_scale_loss(outs, sampled, idx, gt,
                                            gt_mask[..., 0])
            return loss, outs
        (loss, outs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        return loss, outs, grads

    loss_d, outs_d, g_d = run(True)
    loss_g, outs_g, g_g = run(False)
    np.testing.assert_allclose(float(loss_d), float(loss_g), rtol=1e-6)
    for a, b in zip(outs_d, outs_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    flat_d = jax.tree_util.tree_leaves(g_d)
    flat_g = jax.tree_util.tree_leaves(g_g)
    for a, b in zip(flat_d, flat_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_nnet_full_pipeline():
    from sndepth_tpu.ops.edges import edge_model_inputs
    b, h, w = 1, 64, 96
    rng = np.random.RandomState(0)
    rgb = jnp.array(rng.rand(b, h, w, 3).astype(np.float32))
    pre_depth = jnp.array(rng.rand(b, h, w).astype(np.float32))
    model_in = nnet_lib.bgr_preprocess(rgb)
    edge_in = edge_model_inputs(model_in)
    canny = edge_in[..., :1]

    net = nnet_lib.NNET()
    variables = net.init(jax.random.PRNGKey(0), pre_depth, rgb, edge_in,
                         canny)
    norm, depth, _ = net.apply(variables, pre_depth, rgb, edge_in, canny)
    assert norm.shape == (b, h, w, 3)
    assert depth.shape == (b, h, w, 1)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(norm), axis=-1), 1.0, atol=1e-4)
    assert np.isfinite(np.asarray(depth)).all()


def test_shift_depthwise_matches_grouped_conv():
    """ShiftDepthwise == nn.Conv(feature_group_count=C) exactly: same
    params, same output ('SAME' padding incl. stride 2 / odd dims), same
    gradients."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sndepth_tpu.models.efficientnet import ShiftDepthwise

    rng = np.random.RandomState(3)
    for k, s, c, h, w in [(5, 1, 24, 12, 16), (3, 2, 16, 14, 18),
                          (5, 2, 8, 15, 13), (3, 1, 32, 9, 11)]:
        x = jnp.asarray(rng.randn(2, h, w, c), jnp.float32)
        ref = nn.Conv(c, (k, k), strides=(s, s), padding="SAME",
                      feature_group_count=c, use_bias=False,
                      dtype=jnp.float32)
        v = ref.init(jax.random.PRNGKey(0), x)
        mod = ShiftDepthwise(c, k, s, jnp.float32)
        y_ref = ref.apply(v, x)
        y = mod.apply(v, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)
        g = jnp.asarray(rng.randn(*y_ref.shape), jnp.float32)
        gr = jax.grad(lambda vv, xx: jnp.sum(ref.apply(vv, xx) * g),
                      argnums=(0, 1))(v, x)
        gm = jax.grad(lambda vv, xx: jnp.sum(mod.apply(vv, xx) * g),
                      argnums=(0, 1))(v, x)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4), gr, gm)


def test_normalnet_shift_depthwise_same_params_and_outputs():
    """shift_depthwise changes compute form only on the NNET encoder."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sndepth_tpu.models.efficientnet import EfficientNetEncoder

    x = jnp.asarray(np.random.RandomState(2).rand(1, 32, 32, 3), jnp.float32)
    enc0 = EfficientNetEncoder(dtype=jnp.float32)
    enc1 = EfficientNetEncoder(dtype=jnp.float32, shift_depthwise=True)
    v = enc0.init(jax.random.PRNGKey(0), x)
    v1 = enc1.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v["params"]) ==
            jax.tree_util.tree_structure(v1["params"]))
    f0 = enc0.apply(v, x)
    f1 = enc1.apply(v, x)
    for key in f0:
        np.testing.assert_allclose(np.asarray(f1[key]), np.asarray(f0[key]),
                                   rtol=1e-4, atol=1e-4)


def test_shift_depthwise_bf16_close_to_f32():
    """bf16 ShiftDepthwise accumulates in f32 (like the conv lowering) and
    stays close to the f32 result."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sndepth_tpu.models.efficientnet import ShiftDepthwise

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 12, 16, 24), jnp.float32)
    ref = nn.Conv(24, (5, 5), padding="SAME", feature_group_count=24,
                  use_bias=False, dtype=jnp.float32)
    v = ref.init(jax.random.PRNGKey(0), x)
    y32 = ShiftDepthwise(24, 5, 1, jnp.float32).apply(v, x)
    y16 = ShiftDepthwise(24, 5, 1, jnp.bfloat16).apply(v, x)
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y16, np.float32),
                               np.asarray(y32), rtol=0.05, atol=0.05)
