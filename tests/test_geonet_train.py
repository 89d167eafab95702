"""End-to-end tests of the GeoNet train slice: shapes, jit, loss descent."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sndepth_tpu.core.config import GeoNetConfig
from sndepth_tpu.models.dispnet import DispNetS
from sndepth_tpu.models.posenet import PoseNet
from sndepth_tpu.train import geonet


SMALL = GeoNetConfig(batch_size=2, img_height=64, img_width=96,
                     compute_dtype=jnp.float32)


def synthetic_batch(config, seed=0):
    rng = np.random.RandomState(seed)
    b, h, w = config.batch_size, config.img_height, config.img_width
    tgt = rng.randint(0, 256, (b, h, w, 3), dtype=np.uint8)
    # Sources: shifted copies of tgt so the photometric loss has signal.
    src = np.concatenate([np.roll(tgt, 2, axis=2), np.roll(tgt, -2, axis=2)],
                         axis=-1)
    k = np.tile(np.array([[[w / 2.0, 0, w / 2.0],
                           [0, w / 2.0, h / 2.0],
                           [0, 0, 1]]], np.float32), (b, 1, 1))
    return {"tgt": jnp.array(tgt), "src": jnp.array(src),
            "intrinsics": jnp.array(k)}


def test_dispnet_output_shapes():
    net = DispNetS()
    x = jnp.zeros((2, 64, 96, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    disps = net.apply(params, x)
    assert [d.shape for d in disps] == [
        (2, 64, 96, 1), (2, 32, 48, 1), (2, 16, 24, 1), (2, 8, 12, 1)]
    for d in disps:
        dn = np.asarray(d)
        assert dn.min() >= 0.01 and dn.max() <= 10.01


def test_posenet_output_shape_and_scale():
    net = PoseNet(num_source=2)
    x = jnp.ones((3, 64, 96, 9))
    params = net.init(jax.random.PRNGKey(0), x)
    poses = np.asarray(net.apply(params, x))
    assert poses.shape == (3, 2, 6)
    assert np.abs(poses).max() < 1.0  # 0.01-scaled head keeps poses small


def test_loss_finite_and_positive():
    state = geonet.create_train_state(SMALL)
    batch = geonet.preprocess_batch(synthetic_batch(SMALL))
    loss, aux = geonet.geonet_loss(state.params, batch, SMALL)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert np.isfinite(float(aux["loss_rigid_warp"]))
    assert np.isfinite(float(aux["loss_disp_smooth"]))


def test_train_step_decreases_loss():
    state = geonet.create_train_state(SMALL)
    step = geonet.make_train_step(SMALL)
    batch = synthetic_batch(SMALL)
    first = None
    last = None
    for _ in range(8):
        state, metrics = step(state, batch)
        val = float(metrics["loss_total"])
        assert np.isfinite(val)
        if first is None:
            first = val
        last = val
    assert last < first
    assert int(state.step) == 8


def test_gradients_nonzero_for_both_nets():
    state = geonet.create_train_state(SMALL)
    batch = geonet.preprocess_batch(synthetic_batch(SMALL))
    grads = jax.grad(lambda p: geonet.geonet_loss(p, batch, SMALL)[0])(
        state.params)
    disp_norm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["disp"], 0.0)
    pose_norm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["pose"], 0.0)
    assert disp_norm > 0
    assert pose_norm > 0


def test_train_flow_mode():
    cfg = GeoNetConfig(batch_size=1, img_height=64, img_width=96,
                       compute_dtype=jnp.float32, train_flow=True)
    state = geonet.create_train_state(cfg)
    assert "flow" in state.params
    batch = geonet.preprocess_batch(synthetic_batch(cfg))
    loss, aux = geonet.geonet_loss(state.params, batch, cfg)
    assert np.isfinite(float(loss))
    for k in ("loss_full_warp", "loss_full_smooth",
              "loss_geometric_consistency"):
        assert np.isfinite(float(aux[k])), k
    grads = jax.grad(lambda p: geonet.geonet_loss(p, batch, cfg)[0])(
        state.params)
    flow_norm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["flow"], 0.0)
    assert flow_norm > 0


def test_nonfinite_update_is_skipped():
    state = geonet.create_train_state(SMALL)
    step = geonet.make_train_step(SMALL)
    batch = synthetic_batch(SMALL)
    state, _ = step(state, batch)
    params_after_1 = jax.device_get(state.params)

    # Poison the batch: NaN images produce NaN loss/grads; apply_if_finite
    # must skip the update, leaving params unchanged.
    bad = dict(batch)
    bad["tgt"] = jnp.full_like(batch["tgt"].astype(jnp.float32),
                               jnp.nan).astype(batch["tgt"].dtype)
    # uint8 can't hold NaN; poison through intrinsics instead.
    bad = dict(batch)
    bad["intrinsics"] = jnp.full_like(batch["intrinsics"], jnp.nan)
    state, metrics = step(state, bad)
    params_after_2 = jax.device_get(state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params_after_1, params_after_2)


def test_multihost_single_process():
    from sndepth_tpu.parallel.multihost import (initialize_multihost,
                                                per_host_batch_slice)
    info = initialize_multihost()
    assert info["process_count"] == 1
    per, off = per_host_batch_slice(8)
    assert per == 8 and off == 0


def test_s2d_conv_matches_direct_conv():
    """_S2DConv (space-to-depth form of the lane-starved encoder convs) is
    mathematically identical to nn.Conv with the same params, including the
    odd-spatial-dim fallback path."""
    import flax.linen as nn

    from sndepth_tpu.models.dispnet import _S2DConv

    rng = np.random.RandomState(0)
    for k, c, h, w in [(7, 32, 16, 24), (5, 64, 12, 20), (3, 16, 8, 10),
                       (7, 32, 15, 24)]:
        x = jnp.asarray(rng.randn(2, h, w, c), jnp.float32)
        p = k // 2
        ref = nn.Conv(c, (k, k), padding=((p, p), (p, p)),
                      dtype=jnp.float32)
        variables = ref.init(jax.random.PRNGKey(1), x)
        y_ref = ref.apply(variables, x)
        y_s2d = _S2DConv(c, k, jnp.float32).apply(
            {"params": variables["params"]}, x)
        np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                                   atol=1e-4)


def test_s2d_conv_grads_match_direct_conv():
    """The packed-gradient custom VJP of _S2DConv equals nn.Conv autodiff:
    dx via the packed-output fold of the flipped-kernel conv, dw via the
    folded conv's own weight-grad, db via the reduce — all exact up to f32
    reassociation. Covers asymmetric Cin != Cout (decoder iconv shapes)."""
    import flax.linen as nn

    from sndepth_tpu.models.dispnet import _S2DConv

    rng = np.random.RandomState(7)
    for k, c_in, c_out, h, w in [(3, 17, 16, 8, 12), (3, 65, 32, 10, 14),
                                 (7, 32, 32, 16, 24)]:
        x = jnp.asarray(rng.randn(2, h, w, c_in), jnp.float32)
        g = jnp.asarray(rng.randn(2, h, w, c_out), jnp.float32)
        p = k // 2
        ref = nn.Conv(c_out, (k, k), padding=((p, p), (p, p)),
                      dtype=jnp.float32)
        variables = ref.init(jax.random.PRNGKey(1), x)
        s2d = _S2DConv(c_out, k, jnp.float32)

        def loss(mod, v, xx):
            return jnp.sum(mod.apply(v, xx) * g)

        gr_v, gr_x = jax.grad(loss, argnums=(1, 2))(ref, variables, x)
        gs_v, gs_x = jax.grad(loss, argnums=(1, 2))(s2d, variables, x)
        np.testing.assert_allclose(np.asarray(gs_x), np.asarray(gr_x),
                                   rtol=1e-5, atol=1e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-4),
            gr_v, gs_v)


def test_packed_dgrad_down_conv_matches_direct():
    """_PackedDGradDownConv: identical forward to the stride-2 nn.Conv and
    identical gradients (dx via the parity-split packed conv over dy)."""
    import flax.linen as nn

    from sndepth_tpu.models.dispnet import _PackedDGradDownConv

    rng = np.random.RandomState(11)
    for k, c_in, c_out, h, w in [(5, 32, 64, 16, 24), (7, 3, 32, 16, 20),
                                 (3, 64, 128, 12, 16), (5, 32, 64, 15, 21)]:
        x = jnp.asarray(rng.randn(2, h, w, c_in), jnp.float32)
        p = k // 2
        ref = nn.Conv(c_out, (k, k), strides=(2, 2),
                      padding=((p, p), (p, p)), dtype=jnp.float32)
        variables = ref.init(jax.random.PRNGKey(2), x)
        mod = _PackedDGradDownConv(c_out, k, jnp.float32)
        y_ref = ref.apply(variables, x)
        y = mod.apply(variables, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-4)
        g = jnp.asarray(rng.randn(*y_ref.shape), jnp.float32)

        def loss(m, v, xx):
            return jnp.sum(m.apply(v, xx) * g)

        gr_v, gr_x = jax.grad(loss, argnums=(1, 2))(ref, variables, x)
        gs_v, gs_x = jax.grad(loss, argnums=(1, 2))(mod, variables, x)
        np.testing.assert_allclose(np.asarray(gs_x), np.asarray(gr_x),
                                   rtol=1e-5, atol=1e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-4),
            gr_v, gs_v)


def test_dispnet_s2d_iconv_levels_same_params_and_outputs():
    """s2d_iconv_levels changes compute form only: identical param tree,
    same disparities, same gradients (f32 rounding)."""
    from sndepth_tpu.models.dispnet import DispNetS

    x = jnp.asarray(np.random.RandomState(5).randn(2, 64, 96, 3),
                    jnp.float32)
    net0 = DispNetS(dtype=jnp.float32, s2d_iconv_levels=())
    net1 = DispNetS(dtype=jnp.float32, s2d_iconv_levels=(4, 5, 6),
                    packed_dgrad_levels=(1, 2), s2d_heads=True)
    v = net0.init(jax.random.PRNGKey(0), x)
    v1 = net1.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v["params"]) ==
            jax.tree_util.tree_structure(v1["params"]))
    d0 = net0.apply(v, x)
    d1 = net1.apply(v, x)
    for a, b in zip(d0, d1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def loss(net, vv):
        return sum(jnp.sum(d) for d in net.apply(vv, x))

    g0 = jax.grad(lambda vv: loss(net0, vv))(v)
    g1 = jax.grad(lambda vv: loss(net1, vv))(v)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4), g0, g1)


def test_dispnet_s2d_levels_same_params_and_outputs():
    """s2d_levels changes compute form only: identical param tree, same
    disparities (f32 rounding)."""
    from sndepth_tpu.models.dispnet import DispNetS

    x = jnp.asarray(np.random.RandomState(1).randn(2, 64, 96, 3),
                    jnp.float32)
    net0 = DispNetS(dtype=jnp.float32, s2d_levels=())
    net1 = DispNetS(dtype=jnp.float32, s2d_levels=(0, 1))
    v = net0.init(jax.random.PRNGKey(0), x)
    v1 = net1.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v["params"]) ==
            jax.tree_util.tree_structure(v1["params"]))
    d0 = net0.apply(v, x)
    d1 = net1.apply(v, x)
    for a, b in zip(d0, d1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tapstack_head_conv_matches_direct():
    """_TapStackHeadConv == the 3x3 C->1 nn.Conv head with the same params
    (values to f32 roundoff; gradients too), incl. inside DispNetS via the
    mat_heads knob."""
    import flax.linen as nn
    from sndepth_tpu.models.dispnet import (DispNetS, _TapStackHeadConv,
                                            _xavier)

    rng = np.random.RandomState(7)
    for c_in, h, w in [(16, 12, 20), (32, 7, 9)]:
        x = jnp.asarray(rng.randn(2, h, w, c_in), jnp.float32)
        ref = nn.Conv(1, (3, 3), padding="SAME", dtype=jnp.float32,
                      kernel_init=_xavier)
        v = ref.init(jax.random.PRNGKey(0), x)
        y_ref = ref.apply(v, x)
        y_mat = _TapStackHeadConv(jnp.float32).apply(v, x)
        np.testing.assert_allclose(np.asarray(y_mat), np.asarray(y_ref),
                                   atol=1e-5)
        g_ref = jax.grad(lambda vv: jnp.sum(ref.apply(vv, x) ** 2))(v)
        g_mat = jax.grad(
            lambda vv: jnp.sum(_TapStackHeadConv(jnp.float32).apply(
                vv, x) ** 2))(v)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
            g_mat, g_ref)

    x = jnp.asarray(rng.randn(2, 64, 96, 3), jnp.float32)
    net0 = DispNetS(dtype=jnp.float32)
    net1 = DispNetS(dtype=jnp.float32, mat_heads=True)
    v = net0.init(jax.random.PRNGKey(0), x)
    v1 = net1.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v["params"]) ==
            jax.tree_util.tree_structure(v1["params"]))
    for a, b in zip(net0.apply(v, x), net1.apply(v, x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_s2d_upconv_matches_torch_transpose():
    """_S2DUpConv2x == TorchConvTranspose2x with the same params."""
    from sndepth_tpu.models.dispnet import (TorchConvTranspose2x,
                                            _S2DUpConv2x)

    rng = np.random.RandomState(3)
    for c_in, c_out, h, w in [(32, 16, 10, 14), (8, 4, 5, 7)]:
        x = jnp.asarray(rng.randn(2, h, w, c_in), jnp.float32)
        ref = TorchConvTranspose2x(c_out, jnp.float32)
        variables = ref.init(jax.random.PRNGKey(0), x)
        y_ref = ref.apply(variables, x)
        y_s2d = _S2DUpConv2x(c_out, jnp.float32).apply(variables, x)
        assert y_ref.shape == (2, 2 * h, 2 * w, c_out)
        np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                                   atol=1e-5)


def test_wgrad_s2d_conv_matches_direct():
    """_WgradS2DConv == nn.Conv fwd; dx/dw/db match autodiff of the
    direct conv (the wgrad is computed through the folded form)."""
    import flax.linen as nn
    from sndepth_tpu.models.dispnet import _WgradS2DConv

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 12, 17), jnp.float32)
    cot = jnp.asarray(rng.randn(2, 8, 12, 16), jnp.float32)

    ref = nn.Conv(16, (3, 3), padding="SAME", dtype=jnp.float32)
    got = _WgradS2DConv(16, 3, jnp.float32)
    v = ref.init(jax.random.PRNGKey(0), x)

    y_ref = ref.apply(v, x)
    y_got = got.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               atol=1e-6)

    def loss(mod):
        return lambda p, xx: jnp.sum(
            mod.apply({"params": p}, xx) * cot)

    g_ref = jax.grad(loss(ref), argnums=(0, 1))(v["params"], x)
    g_got = jax.grad(loss(got), argnums=(0, 1))(v["params"], x)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_ref),
                     jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=2e-5, rtol=1e-5)


def test_deconv2x_custom_vjp_matches_autodiff():
    """_deconv2x's hand-formed dx/dk/db == autodiff of the lhs-dilated
    forward (same values, no full-res reverse / lane-starved wgrad)."""
    from sndepth_tpu.models.dispnet import _deconv2x, _deconv2x_impl

    rng = np.random.RandomState(7)
    for c_in, c_out, h, w in [(17, 16, 10, 14), (8, 4, 5, 7)]:
        x = jnp.asarray(rng.randn(2, h, w, c_in), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, c_in, c_out) * 0.2, jnp.float32)
        b = jnp.asarray(rng.randn(c_out) * 0.1, jnp.float32)
        cot = jnp.asarray(rng.randn(2, 2 * h, 2 * w, c_out), jnp.float32)

        def loss_ref(x, k, b):
            return jnp.sum(_deconv2x_impl(x, k, b, jnp.float32) * cot)

        def loss_new(x, k, b):
            return jnp.sum(_deconv2x(x, k, b, jnp.float32) * cot)

        y0 = _deconv2x_impl(x, k, b, jnp.float32)
        y1 = _deconv2x(x, k, b, jnp.float32)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0))

        g0 = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(x, k, b)
        g1 = jax.jit(jax.grad(loss_new, argnums=(0, 1, 2)))(x, k, b)
        for a_, b_, name in zip(g0, g1, ("dx", "dk", "db")):
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a_), atol=2e-4, rtol=1e-4,
                err_msg=name)


@pytest.mark.slow
def test_train_step_loss_invariant_to_lane_packing_knobs():
    """The full train step computes the same loss with every lane-packing
    knob enabled (s2d levels, iconv s2d, packed dgrads, s2d heads,
    flownet knobs are exercised by the stage-2 test) as with all off —
    the knobs are compute forms, not math changes."""
    from sndepth_tpu.core.config import GeoNetConfig
    from sndepth_tpu.train import geonet as tg

    base = GeoNetConfig(batch_size=2, img_height=32, img_width=64,
                        compute_dtype=jnp.float32,
                        dispnet_s2d_levels=())
    full = GeoNetConfig(batch_size=2, img_height=32, img_width=64,
                        compute_dtype=jnp.float32,
                        dispnet_s2d_levels=(0, 1),
                        dispnet_s2d_iconv_levels=(4, 5, 6),
                        dispnet_packed_dgrad_levels=(1, 2, 3),
                        dispnet_s2d_heads=True)
    rng = np.random.RandomState(3)
    batch = {
        "tgt": jnp.asarray(rng.randint(0, 256, (2, 32, 64, 3), np.uint8)),
        "src": jnp.asarray(rng.randint(0, 256, (2, 32, 64, 6), np.uint8)),
        "intrinsics": jnp.asarray(np.tile(np.array(
            [[[32.0, 0, 32.0], [0, 32.0, 16.0], [0, 0, 1]]], np.float32),
            (2, 1, 1))),
    }
    state = tg.create_train_state(base)
    _, m0 = tg.train_step(state, batch, base)
    state1 = tg.create_train_state(full)
    _, m1 = tg.train_step(state1, batch, full)
    np.testing.assert_allclose(float(m1["loss_total"]),
                               float(m0["loss_total"]), rtol=2e-5)
