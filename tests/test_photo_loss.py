"""Fused warp+photometric-loss kernel vs the split XLA ops (interpreter).

The fused kernel (`sndepth_tpu/kernels/photo_loss.py`) must match
``sum(alpha*dssim(tgt, warp(src, coords)) + (1-alpha)*|tgt - warp|)`` and
its coordinate gradient, for both sampler modes, including image-edge
pooling and out-of-image coordinates.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sndepth_tpu.kernels.photo_loss import warp_photo_loss
from sndepth_tpu.ops.ssim import dssim
from sndepth_tpu.ops.warp import (bilinear_sampler,
                                  bilinear_sampler_zero_pad)

_REF = {"edge_zero": bilinear_sampler, "zero_pad": bilinear_sampler_zero_pad}
ALPHA = 0.85


def _ref_loss(tgt, src, coords, mode):
    warped = _REF[mode](src, coords)
    return jnp.sum(ALPHA * dssim(tgt, warped)
                   + (1.0 - ALPHA) * jnp.abs(tgt - warped))


def _case(seed, b=2, h=16, w=52, c=3, spread=1.5):
    rng = np.random.RandomState(seed)
    tgt = jnp.asarray(rng.rand(b, h, w, c) * 2 - 1, jnp.float32)
    src = jnp.asarray(rng.rand(b, h, w, c) * 2 - 1, jnp.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = np.stack([xs, ys], -1)[None].repeat(b, 0)
    coords = jnp.asarray(
        grid + rng.uniform(-spread, spread, grid.shape), jnp.float32)
    return tgt, src, coords


@pytest.mark.parametrize("mode", ["edge_zero", "zero_pad"])
def test_loss_value_matches_split_ops(mode):
    tgt, src, coords = _case(0)
    got = float(warp_photo_loss(tgt, src, coords, ALPHA, mode))
    want = float(_ref_loss(tgt, src, coords, mode))
    np.testing.assert_allclose(got, want, rtol=2e-5)


@pytest.mark.parametrize("mode", ["edge_zero", "zero_pad"])
def test_coord_gradients_match_split_ops(mode):
    tgt, src, coords = _case(1)
    g_f = jax.grad(
        lambda cc: 0.37 * warp_photo_loss(tgt, src, cc, ALPHA, mode)
    )(coords)
    g_r = jax.grad(lambda cc: 0.37 * _ref_loss(tgt, src, cc, mode))(coords)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               atol=2e-4, rtol=1e-3)


def test_out_of_image_coords_and_wild_spread():
    # Wild coords exercise the slow warp path and the OOB weight masking.
    tgt, src, coords = _case(2, h=16, w=40, spread=30.0)
    got = float(warp_photo_loss(tgt, src, coords, ALPHA, "edge_zero"))
    want = float(_ref_loss(tgt, src, coords, "edge_zero"))
    np.testing.assert_allclose(got, want, rtol=2e-5)
    g_f = jax.grad(
        lambda cc: warp_photo_loss(tgt, src, cc, ALPHA, "edge_zero")
    )(coords)
    g_r = jax.grad(lambda cc: _ref_loss(tgt, src, cc, "edge_zero"))(coords)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               atol=2e-4, rtol=1e-3)


def test_lane_padded_width_edge_pooling():
    # w=52 pads to 128 lanes: the pad columns must contribute neither
    # value nor gradient (the reference loss has no outputs there), and
    # pooling at the true right edge must see zero padding exactly like
    # the reference's zero-padded 3x3 pool.
    tgt, src, coords = _case(3, b=1, h=8, w=52, spread=0.7)
    got = float(warp_photo_loss(tgt, src, coords, ALPHA, "edge_zero"))
    want = float(_ref_loss(tgt, src, coords, "edge_zero"))
    np.testing.assert_allclose(got, want, rtol=2e-5)
    g_f = jax.grad(
        lambda cc: warp_photo_loss(tgt, src, cc, ALPHA, "edge_zero")
    )(coords)
    g_r = jax.grad(lambda cc: _ref_loss(tgt, src, cc, "edge_zero"))(coords)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               atol=2e-4, rtol=1e-3)


def _pair_case(seed, b=2, ns=2, h=16, w=52, c=3, spread=1.5):
    rng = np.random.RandomState(seed)
    tgt = jnp.asarray(rng.rand(b, h, w, c) * 2 - 1, jnp.float32)
    srcs = jnp.asarray(rng.rand(b, ns, h, w, c) * 2 - 1, jnp.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = np.stack([xs, ys], -1)[None, None].repeat(b, 0).repeat(ns, 1)
    cf = jnp.asarray(grid + rng.uniform(-spread, spread, grid.shape),
                     jnp.float32)
    cb = jnp.asarray(grid + rng.uniform(-spread, spread, grid.shape),
                     jnp.float32)
    return tgt, srcs, cf, cb


def _pair_ref(tgt, srcs, cf, cb, mode):
    b, ns = srcs.shape[0], srcs.shape[1]
    total = 0.0
    for s in range(ns):
        total = total + _ref_loss(tgt, srcs[:, s], cf[:, s], mode)
        total = total + _ref_loss(srcs[:, s], tgt, cb[:, s], mode)
    return total


@pytest.mark.parametrize("mode", ["edge_zero", "zero_pad"])
def test_pair_loss_value_matches_split_ops(mode):
    from sndepth_tpu.kernels.photo_loss import warp_photo_pair_loss
    tgt, srcs, cf, cb = _pair_case(4)
    got = float(warp_photo_pair_loss(tgt, srcs, cf, cb, ALPHA, mode))
    want = float(_pair_ref(tgt, srcs, cf, cb, mode))
    np.testing.assert_allclose(got, want, rtol=2e-5)


@pytest.mark.parametrize("mode", ["edge_zero", "zero_pad"])
def test_pair_coord_gradients_match_split_ops(mode):
    from sndepth_tpu.kernels.photo_loss import warp_photo_pair_loss
    tgt, srcs, cf, cb = _pair_case(5, b=1, h=8, w=40)
    gf, gb = jax.grad(
        lambda a, b2: 0.37 * warp_photo_pair_loss(
            tgt, srcs, a, b2, ALPHA, mode), argnums=(0, 1))(cf, cb)
    rf, rb = jax.grad(
        lambda a, b2: 0.37 * _pair_ref(tgt, srcs, a, b2, mode),
        argnums=(0, 1))(cf, cb)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rf),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               atol=2e-4, rtol=1e-3)


def test_pair_wild_coords_slow_path():
    from sndepth_tpu.kernels.photo_loss import warp_photo_pair_loss
    tgt, srcs, cf, cb = _pair_case(6, b=1, ns=2, h=16, w=40, spread=30.0)
    got = float(warp_photo_pair_loss(tgt, srcs, cf, cb, ALPHA,
                                     "edge_zero"))
    want = float(_pair_ref(tgt, srcs, cf, cb, "edge_zero"))
    np.testing.assert_allclose(got, want, rtol=2e-5)


@pytest.mark.parametrize("mode", ["edge_zero", "zero_pad"])
def test_pair_bandk_spread_coords(mode):
    """y-spread 2-3 within a row segment (band-K warp path): pair loss and
    coord gradients must still match the split ops."""
    import sndepth_tpu.kernels.warp as wk
    from sndepth_tpu.kernels.photo_loss import warp_photo_pair_loss
    rng = np.random.RandomState(14)
    b, ns, h, w, c = 1, 2, 16, 300, 3
    tgt = jnp.asarray(rng.rand(b, h, w, c) * 2 - 1, jnp.float32)
    srcs = jnp.asarray(rng.rand(b, ns, h, w, c) * 2 - 1, jnp.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = np.stack([xs, ys], -1)[None, None].repeat(b, 0).repeat(ns, 1)
    tilt = np.stack([0.3 * np.sin(ys / 5.0), 1.5 * np.sin(xs / 60.0)], -1)
    cf = jnp.asarray(grid + tilt + rng.uniform(-0.3, 0.3, grid.shape),
                     jnp.float32)
    cb = jnp.asarray(grid + tilt + rng.uniform(-0.3, 0.3, grid.shape),
                     jnp.float32)
    wp = wk._round_up(w, wk._LANE)
    meta = np.asarray(wk.tile_meta(
        jnp.pad(cf[:, 0, ..., 0], ((0, 0), (0, 0), (0, wp - w)),
                mode="edge"),
        jnp.pad(cf[:, 0, ..., 1], ((0, 0), (0, 0), (0, wp - w)),
                mode="edge"), h, w, mode, h, wp))
    assert (meta[..., 0] == 2).any(), "coords must exercise band-K"
    got = float(warp_photo_pair_loss(tgt, srcs, cf, cb, ALPHA, mode))
    want = float(_pair_ref(tgt, srcs, cf, cb, mode))
    np.testing.assert_allclose(got, want, rtol=2e-5)
    gf, gb = jax.grad(
        lambda a, b2: 0.37 * warp_photo_pair_loss(
            tgt, srcs, a, b2, ALPHA, mode), argnums=(0, 1))(cf, cb)
    rf, rb = jax.grad(
        lambda a, b2: 0.37 * _pair_ref(tgt, srcs, a, b2, mode),
        argnums=(0, 1))(cf, cb)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rf),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               atol=2e-4, rtol=1e-3)


def test_geonet_stage1_loss_pair_matches_split(monkeypatch):
    """End-to-end: the PAIR kernel path in the stage-1 GeoNet loss equals
    the split-ops loss (tiny config, interpreter on CPU)."""
    import numpy as np
    from sndepth_tpu.core.config import GeoNetConfig
    from sndepth_tpu.kernels import photo_loss as pk
    from sndepth_tpu.train import geonet

    config = GeoNetConfig(batch_size=2, img_height=16, img_width=52,
                          num_scales=2)
    rng = np.random.RandomState(1)
    h, w = config.img_height, config.img_width
    batch = {
        "tgt": jnp.asarray(rng.randint(0, 256, (2, h, w, 3), dtype=np.uint8)),
        "src": jnp.asarray(rng.randint(0, 256, (2, h, w, 6), dtype=np.uint8)),
        "intrinsics": jnp.asarray(np.tile(
            np.array([[[30.0, 0, 26.0], [0, 30.0, 8.0], [0, 0, 1]]],
                     np.float32), (2, 1, 1))),
    }
    params = geonet.init_params(jax.random.PRNGKey(0), config)
    pb = geonet.preprocess_batch(batch)

    monkeypatch.setattr(pk, "_BACKEND", "split")
    _, aux_split = geonet.geonet_loss(params, pb, config)
    monkeypatch.setattr(pk, "_BACKEND", "pair")
    _, aux_pair = geonet.geonet_loss(params, pb, config)
    np.testing.assert_allclose(float(aux_pair["loss_rigid_warp"]),
                               float(aux_split["loss_rigid_warp"]),
                               rtol=3e-5)
    np.testing.assert_allclose(float(aux_pair["loss_total"]),
                               float(aux_split["loss_total"]), rtol=3e-5)


def test_geonet_stage1_loss_matches_split(monkeypatch):
    """End-to-end: the stage-1 GeoNet loss with the fused kernel equals
    the split-ops loss (tiny config, interpreter on CPU)."""
    import numpy as np
    from sndepth_tpu.core.config import GeoNetConfig
    from sndepth_tpu.kernels import photo_loss as pk
    from sndepth_tpu.train import geonet

    config = GeoNetConfig(batch_size=2, img_height=16, img_width=52,
                          num_scales=2)
    rng = np.random.RandomState(0)
    h, w = config.img_height, config.img_width
    batch = {
        "tgt": jnp.asarray(rng.randint(0, 256, (2, h, w, 3), dtype=np.uint8)),
        "src": jnp.asarray(rng.randint(0, 256, (2, h, w, 6), dtype=np.uint8)),
        "intrinsics": jnp.asarray(np.tile(
            np.array([[[30.0, 0, 26.0], [0, 30.0, 8.0], [0, 0, 1]]],
                     np.float32), (2, 1, 1))),
    }
    params = geonet.init_params(jax.random.PRNGKey(0), config)
    pb = geonet.preprocess_batch(batch)

    monkeypatch.setattr(pk, "_BACKEND", "split")
    _, aux_split = geonet.geonet_loss(params, pb, config)
    monkeypatch.setattr(pk, "_BACKEND", "fused")
    _, aux_fused = geonet.geonet_loss(params, pb, config)
    np.testing.assert_allclose(float(aux_fused["loss_rigid_warp"]),
                               float(aux_split["loss_rigid_warp"]),
                               rtol=3e-5)
    np.testing.assert_allclose(float(aux_fused["loss_total"]),
                               float(aux_split["loss_total"]), rtol=3e-5)


def _pair_w_ref(tgt, srcs, cf, cb, wf, wb, mode):
    ns = srcs.shape[1]
    total = 0.0
    for s in range(ns):
        ef = (ALPHA * dssim(tgt, _REF[mode](srcs[:, s], cf[:, s]))
              + (1 - ALPHA) * jnp.abs(tgt - _REF[mode](srcs[:, s],
                                                       cf[:, s])))
        eb = (ALPHA * dssim(srcs[:, s], _REF[mode](tgt, cb[:, s]))
              + (1 - ALPHA) * jnp.abs(srcs[:, s] - _REF[mode](tgt,
                                                              cb[:, s])))
        total = total + jnp.sum(wf[:, s, :, :, None] * ef)
        total = total + jnp.sum(wb[:, s, :, :, None] * eb)
    return total


@pytest.mark.parametrize("mode", ["edge_zero", "zero_pad"])
def test_pair_weighted_loss_and_grads_match_split_ops(mode):
    """warp_photo_pair_loss_weighted == per-pixel-weighted split ops,
    value and coord gradients (stage-2 GeoNet's masked loss form)."""
    from sndepth_tpu.kernels.photo_loss import warp_photo_pair_loss_weighted
    tgt, srcs, cf, cb = _pair_case(7, b=1, h=8, w=40)
    rng = np.random.RandomState(7)
    b, ns, h, w = cf.shape[:4]
    wf = jnp.asarray(rng.rand(b, ns, h, w), jnp.float32)
    wb = jnp.asarray((rng.rand(b, ns, h, w) > 0.4), jnp.float32)

    got = float(warp_photo_pair_loss_weighted(tgt, srcs, cf, cb, wf, wb,
                                              ALPHA, mode))
    want = float(_pair_w_ref(tgt, srcs, cf, cb, wf, wb, mode))
    np.testing.assert_allclose(got, want, rtol=2e-5)

    gf, gb = jax.grad(
        lambda a, b2: 0.43 * warp_photo_pair_loss_weighted(
            tgt, srcs, a, b2, wf, wb, ALPHA, mode),
        argnums=(0, 1))(cf, cb)
    rf, rb = jax.grad(
        lambda a, b2: 0.43 * _pair_w_ref(tgt, srcs, a, b2, wf, wb, mode),
        argnums=(0, 1))(cf, cb)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rf),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               atol=2e-4, rtol=1e-3)


def test_geonet_stage2_flow_loss_pair_matches_split(monkeypatch):
    """End-to-end: the weighted pair-kernel path in the stage-2
    (train_flow) loss equals the split-ops loss — value AND flow-param
    gradients (the full-flow losses differentiate through the computed
    residual flow, `baseline.py:1061-1135`)."""
    import numpy as np
    from sndepth_tpu.core.config import GeoNetConfig
    from sndepth_tpu.kernels import photo_loss as pk
    from sndepth_tpu.train import geonet

    config = GeoNetConfig(batch_size=1, img_height=16, img_width=52,
                          num_scales=2, train_flow=True)
    rng = np.random.RandomState(2)
    h, w = config.img_height, config.img_width
    batch = {
        "tgt": jnp.asarray(rng.randint(0, 256, (1, h, w, 3),
                                       dtype=np.uint8)),
        "src": jnp.asarray(rng.randint(0, 256, (1, h, w, 6),
                                       dtype=np.uint8)),
        "intrinsics": jnp.asarray(np.tile(
            np.array([[[30.0, 0, 26.0], [0, 30.0, 8.0], [0, 0, 1]]],
                     np.float32), (1, 1, 1))),
    }
    params = geonet.init_params(jax.random.PRNGKey(0), config)
    pb = geonet.preprocess_batch(batch)

    def flow_grad(aux_and_loss_fn):
        def f(flow_params):
            p = dict(params)
            p["flow"] = flow_params
            loss, _ = geonet.geonet_loss(p, pb, config)
            return loss
        return jax.grad(f)(params["flow"])

    monkeypatch.setattr(pk, "_BACKEND", "split")
    _, aux_split = geonet.geonet_loss(params, pb, config)
    g_split = flow_grad(None)
    monkeypatch.setattr(pk, "_BACKEND", "pair")
    _, aux_pair = geonet.geonet_loss(params, pb, config)
    g_pair = flow_grad(None)

    for k in ("loss_full_warp", "loss_total", "loss_rigid_warp"):
        np.testing.assert_allclose(float(aux_pair[k]),
                                   float(aux_split[k]), rtol=5e-5), k
    flat_s = jax.tree_util.tree_leaves(g_split)
    flat_p = jax.tree_util.tree_leaves(g_pair)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-3)


@pytest.mark.parametrize("pool", ["row", "mxu"])
def test_pair_pool_backends_match_shift(pool, monkeypatch):
    """The banded-matmul pool backends must reproduce the shift pool
    exactly (0/1 tridiagonal matmul == 3-tap sum in f32)."""
    from sndepth_tpu.kernels import photo_loss as pk
    tgt, srcs, cf, cb = _pair_case(9, b=1, h=8, w=40)

    monkeypatch.setattr(pk, "_POOL", "shift")
    base = float(pk._pair_run(tgt, srcs, cf, cb, ALPHA, "edge_zero",
                              False)[0])
    _, gcf0, gcb0 = pk._pair_run(tgt, srcs, cf, cb, ALPHA, "edge_zero",
                                 True)

    monkeypatch.setattr(pk, "_POOL", pool)
    got = float(pk._pair_run(tgt, srcs, cf, cb, ALPHA, "edge_zero",
                             False)[0])
    _, gcf1, gcb1 = pk._pair_run(tgt, srcs, cf, cb, ALPHA, "edge_zero",
                                 True)

    np.testing.assert_allclose(got, base, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(gcf1), np.asarray(gcf0),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gcb1), np.asarray(gcb0),
                               atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("mode", ["edge_zero", "zero_pad"])
def test_pair_portrait_orientation_matches(mode, monkeypatch):
    """Forced portrait dispatch (transposed planes + swapped coords) must
    reproduce the landscape kernel exactly — value and coord grads."""
    from sndepth_tpu.kernels import photo_loss as pk
    tgt, srcs, cf, cb = _pair_case(8, b=1, h=8, w=40)

    monkeypatch.setattr(pk, "_PORTRAIT", "0")
    base = float(pk._pair_run(tgt, srcs, cf, cb, ALPHA, mode, False)[0])
    _, gcf0, gcb0 = pk._pair_run(tgt, srcs, cf, cb, ALPHA, mode, True)

    monkeypatch.setattr(pk, "_PORTRAIT", "1")
    got = float(pk._pair_run(tgt, srcs, cf, cb, ALPHA, mode, False)[0])
    _, gcf1, gcb1 = pk._pair_run(tgt, srcs, cf, cb, ALPHA, mode, True)

    np.testing.assert_allclose(got, base, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(gcf1), np.asarray(gcf0),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gcb1), np.asarray(gcb0),
                               atol=1e-5, rtol=1e-4)


def test_pair_pool_bf16_close_to_f32(monkeypatch):
    """SNDEPTH_PHOTO_POOL_DTYPE=bf16 rounds the row-pool matmul operands
    to bf16 (f32 accumulation; row pool only — the two-matmul mxu pool
    would double-round) — relaxed numerics must stay within bf16
    operand-rounding distance of the exact pools."""
    import jax.numpy as jnp
    from sndepth_tpu.kernels import photo_loss as pk
    tgt, srcs, cf, cb = _pair_case(11, b=1, h=8, w=40)

    monkeypatch.setattr(pk, "_POOL", "row")
    base = float(pk._pair_run(tgt, srcs, cf, cb, ALPHA, "edge_zero",
                              False)[0])
    _, gcf0, gcb0 = pk._pair_run(tgt, srcs, cf, cb, ALPHA, "edge_zero",
                                 True)

    monkeypatch.setattr(pk, "_POOL_DT", jnp.bfloat16)
    got = float(pk._pair_run(tgt, srcs, cf, cb, ALPHA, "edge_zero",
                             False)[0])
    _, gcf1, gcb1 = pk._pair_run(tgt, srcs, cf, cb, ALPHA, "edge_zero",
                                 True)

    np.testing.assert_allclose(got, base, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(gcf1), np.asarray(gcf0),
                               atol=3e-2, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(gcb1), np.asarray(gcb0),
                               atol=3e-2, rtol=5e-2)
