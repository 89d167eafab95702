"""Pallas bilinear-warp kernel vs the XLA ops (interpreter mode on CPU).

The kernel (`sndepth_tpu/kernels/warp.py`) must bit-match both reference
samplers — the GeoNet edge-zero sampler
(/root/reference/utils/utils_edited.py:402-486) and the zero-pad
grid_sample semantics — for values and coordinate/image gradients.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sndepth_tpu.kernels.warp import bilinear_sampler as pallas_sampler
from sndepth_tpu.kernels.warp import flow_warp as pallas_flow_warp
from sndepth_tpu.ops.warp import (bilinear_sampler, bilinear_sampler_zero_pad,
                                  flow_warp)

_REF = {"edge_zero": bilinear_sampler, "zero_pad": bilinear_sampler_zero_pad}


def _rand_case(seed, b=2, h=13, w=37, c=3, ht=11, wt=29, spread=6):
    rng = np.random.RandomState(seed)
    imgs = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    coords = jnp.asarray(
        rng.uniform(-spread, max(h, w) + spread, (b, ht, wt, 2)), jnp.float32)
    return imgs, coords


def test_kernel_matches_both_modes_random_coords():
    imgs, coords = _rand_case(0)
    for mode, ref in _REF.items():
        got = np.asarray(pallas_sampler(imgs, coords, mode))
        want = np.asarray(ref(imgs, coords))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=mode)


def test_kernel_matches_on_smooth_warp_grid():
    # Rigid-flow-like smooth coordinates (the intended workload): small
    # displacements off the identity grid, image dims not lane-aligned.
    rng = np.random.RandomState(1)
    b, h, w, c = 2, 16, 48, 2
    imgs = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = np.stack([xs, ys], -1)[None].repeat(b, 0)
    coords = jnp.asarray(grid + rng.uniform(-2, 2, grid.shape), jnp.float32)
    for mode, ref in _REF.items():
        got = np.asarray(pallas_sampler(imgs, coords, mode))
        want = np.asarray(ref(imgs, coords))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=mode)


def test_kernel_coord_gradients_match():
    imgs, coords = _rand_case(2, b=1, h=9, w=17, c=2, ht=6, wt=10, spread=3)

    for mode, ref in _REF.items():
        def loss(fn, cc):
            out = fn(imgs, cc) if fn is not pallas_sampler else \
                fn(imgs, cc, mode)
            return jnp.sum(jnp.sin(out) * out)

        g_k = jax.grad(lambda cc: loss(pallas_sampler, cc))(coords)
        g_r = jax.grad(lambda cc: loss(ref, cc))(coords)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                                   atol=1e-4, err_msg=mode)


def test_kernel_image_gradients_match():
    imgs, coords = _rand_case(3, b=1, h=8, w=19, c=2, ht=5, wt=9, spread=2)
    for mode, ref in _REF.items():
        g_k = jax.grad(lambda im: jnp.sum(
            pallas_sampler(im, coords, mode) ** 2))(imgs)
        g_r = jax.grad(lambda im: jnp.sum(ref(im, coords) ** 2))(imgs)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                                   atol=1e-4, err_msg=mode)


def test_kernel_flow_warp_matches():
    rng = np.random.RandomState(4)
    src = jnp.asarray(rng.rand(2, 12, 20, 3), jnp.float32)
    flow = jnp.asarray(rng.uniform(-3, 3, (2, 12, 20, 2)), jnp.float32)
    got = np.asarray(pallas_flow_warp(src, flow))
    want = np.asarray(flow_warp(src, flow))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_splat_matches_xla_scatter():
    # Force the Pallas splat (tiny shapes would otherwise fall back) and
    # compare against the XLA scatter-add formulation for both modes.
    import sndepth_tpu.kernels.warp as kw
    old = kw._SPLAT
    rng = np.random.RandomState(7)
    imgs = jnp.asarray(rng.rand(2, 13, 37, 3), jnp.float32)
    coords = jnp.asarray(
        rng.uniform(-5, 45, (2, 11, 29, 2)), jnp.float32)
    g = jnp.asarray(rng.rand(2, 11, 29, 3), jnp.float32)
    try:
        for mode in ("edge_zero", "zero_pad"):
            kw._SPLAT = "xla"
            want = np.asarray(kw._scatter_d_imgs(imgs, coords, g, mode))
            kw._SPLAT = "pallas"
            got = np.asarray(kw._scatter_d_imgs(imgs, coords, g, mode))
            # 3e-4: at edge-clamp sites the (huge, cancelling) corner
            # weights leave ~1e-4 float residue in the XLA scatter's
            # sequential adds; the splat cancels them exactly.
            np.testing.assert_allclose(got, want, atol=3e-4, err_msg=mode)
    finally:
        kw._SPLAT = old


def test_splat_smooth_coords_fast_path():
    import sndepth_tpu.kernels.warp as kw
    old = kw._SPLAT
    rng = np.random.RandomState(8)
    b, h, w, c = 1, 24, 256, 2
    imgs = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = np.stack([xs, ys], -1)[None]
    coords = jnp.asarray(grid + rng.uniform(-1.5, 1.5, grid.shape)
                         .astype(np.float32))
    g = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    try:
        for mode in ("edge_zero", "zero_pad"):
            kw._SPLAT = "xla"
            want = np.asarray(kw._scatter_d_imgs(imgs, coords, g, mode))
            kw._SPLAT = "pallas"
            got = np.asarray(kw._scatter_d_imgs(imgs, coords, g, mode))
            np.testing.assert_allclose(got, want, atol=1e-5, err_msg=mode)
    finally:
        kw._SPLAT = old


def test_warp_of_flow_gradients_with_splat():
    # End-to-end: grad w.r.t. a *warped* (differentiated) field — the
    # stage-2 train_flow pattern — must agree between splat and scatter.
    import sndepth_tpu.kernels.warp as kw
    old = kw._SPLAT
    rng = np.random.RandomState(9)
    flow = jnp.asarray(rng.rand(1, 16, 140, 2), jnp.float32)
    coords = jnp.asarray(
        np.stack(np.meshgrid(np.arange(140), np.arange(16),
                             indexing="xy"), -1)[None]
        + rng.uniform(-2, 2, (1, 16, 140, 2)), jnp.float32)

    def loss(f):
        return jnp.sum(kw.bilinear_sampler(f, coords, "edge_zero") ** 2)

    try:
        kw._SPLAT = "xla"
        want = np.asarray(jax.grad(loss)(flow))
        kw._SPLAT = "pallas"
        got = np.asarray(jax.grad(loss)(flow))
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        kw._SPLAT = old


def test_kernel_diagonal_fast_path_tall_image():
    """hp > 16 engages the diagonal (slope-1) fast path: smooth rigid-flow
    coords must match both samplers for values and coordinate grads, and
    wild coords must still fall back correctly."""
    rng = np.random.RandomState(7)
    b, h, w, c = 2, 40, 200, 3
    imgs = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = np.stack([xs, ys], -1)[None].repeat(b, 0)

    smooth = jnp.asarray(grid + rng.uniform(-2, 2, grid.shape)
                         + np.array([3.0, -1.5]), jnp.float32)
    wild = jnp.asarray(
        rng.uniform(-8, max(h, w) + 8, (b, h, w, 2)), jnp.float32)

    for mode, ref in _REF.items():
        for coords in (smooth, wild):
            got = np.asarray(pallas_sampler(imgs, coords, mode))
            want = np.asarray(ref(imgs, coords))
            np.testing.assert_allclose(got, want, atol=1e-5, err_msg=mode)

        def loss_p(cc):
            return jnp.sum(jnp.cos(pallas_sampler(imgs, cc, mode)))

        def loss_r(cc):
            return jnp.sum(jnp.cos(ref(imgs, cc)))

        gp = np.asarray(jax.grad(loss_p)(smooth))
        gr = np.asarray(jax.grad(loss_r)(smooth))
        np.testing.assert_allclose(gp, gr, atol=1e-4, err_msg=mode)


def test_kernel_band2_fast_path_matches():
    """Spread-0 smooth coords (lane-constant floor(y) per sublane, the
    dominant bench regime) engage the band2-fast path (meta path 4): the
    meta must classify most tiles as 4, and values + coordinate grads
    must match both samplers — including tiles at the bottom edge where
    the 16-row window base clips and the ybar+1 table reads masked
    garbage."""
    import sndepth_tpu.kernels.warp as wk

    rng = np.random.RandomState(17)
    b, h, w, c = 2, 32, 300, 3
    imgs = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = np.stack([xs, ys], -1)[None].repeat(b, 0)
    # Per-row-constant y offsets keep per-sublane y spread exactly 0;
    # x jitter is free. Last rows push past h-1 to hit the clip collapse.
    yoff = np.concatenate([0.3 * np.ones((h - 4, 1), np.float32),
                           2.5 * np.ones((4, 1), np.float32)])
    coords = jnp.asarray(
        grid + np.stack([rng.uniform(-0.4, 0.4, (h, w)).astype(np.float32),
                         np.broadcast_to(yoff, (h, w))], -1)[None],
        jnp.float32)

    hp = wk._round_up(h, wk._SUB)
    wp = wk._round_up(w, wk._LANE)
    cxs = jnp.pad(coords[..., 0], ((0, 0), (0, 0), (0, wp - w)),
                  mode="edge")
    cys = jnp.pad(coords[..., 1], ((0, 0), (0, 0), (0, wp - w)),
                  mode="edge")
    meta = np.asarray(wk.tile_meta(cxs, cys, h, w, "edge_zero", hp, wp))
    assert (meta[..., 0] == 4).mean() > 0.5, "coords must exercise path 4"

    for mode, ref in _REF.items():
        got = np.asarray(pallas_sampler(imgs, coords, mode))
        want = np.asarray(ref(imgs, coords))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=mode)

        def loss_p(cc):
            return jnp.sum(jnp.cos(pallas_sampler(imgs, cc, mode)))

        def loss_r(cc):
            return jnp.sum(jnp.cos(ref(imgs, cc)))

        gp = np.asarray(jax.grad(loss_p)(coords))
        gr = np.asarray(jax.grad(loss_r)(coords))
        np.testing.assert_allclose(gp, gr, atol=1e-4, err_msg=mode)


def test_kernel_bandk_path_matches():
    """Per-sublane y-spread 2-3 (rigid flows with ~2 px of smooth fy
    variation within a 128-lane row segment) engages the band-K path —
    values and coordinate gradients must match both XLA samplers, and the
    meta must actually classify some tiles as path 2."""
    import sndepth_tpu.kernels.warp as wk

    rng = np.random.RandomState(13)
    b, h, w, c = 2, 32, 300, 3
    imgs = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = np.stack([xs, ys], -1)[None].repeat(b, 0)
    tilt = np.stack([0.3 * np.sin(ys / 5.0), 1.5 * np.sin(xs / 60.0)], -1)
    coords = jnp.asarray(grid + tilt[None]
                         + rng.uniform(-0.3, 0.3, grid.shape), jnp.float32)

    hp = wk._round_up(h, wk._SUB)
    wp = wk._round_up(w, wk._LANE)
    cxs = jnp.pad(coords[..., 0], ((0, 0), (0, 0), (0, wp - w)),
                  mode="edge")
    cys = jnp.pad(coords[..., 1], ((0, 0), (0, 0), (0, wp - w)),
                  mode="edge")
    meta = np.asarray(wk.tile_meta(cxs, cys, h, w, "edge_zero", hp, wp))
    assert (meta[..., 0] == 2).any(), "coords must exercise band-K"

    for mode, ref in _REF.items():
        got = np.asarray(pallas_sampler(imgs, coords, mode))
        want = np.asarray(ref(imgs, coords))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=mode)

        def loss_p(cc):
            return jnp.sum(jnp.cos(pallas_sampler(imgs, cc, mode)))

        def loss_r(cc):
            return jnp.sum(jnp.cos(ref(imgs, cc)))

        gp = np.asarray(jax.grad(loss_p)(coords))
        gr = np.asarray(jax.grad(loss_r)(coords))
        np.testing.assert_allclose(gp, gr, atol=1e-4, err_msg=mode)


def test_tile_meta_mono_matches_block_oracle():
    """The monotone reduce_window tile_meta (default) is bit-identical to
    the original strided-reduce form across path regimes and both modes."""
    import sndepth_tpu.kernels.warp as wk

    rng = np.random.RandomState(11)
    b, ht, wt = 6, 32, 256
    h, w = 40, 300
    hp = wk._round_up(h, wk._SUB)
    wp = wk._round_up(w, wk._LANE)
    ys0, xs0 = np.mgrid[0:ht, 0:wt].astype(np.float32)
    xs = np.broadcast_to(xs0, (b, ht, wt)).copy()
    ys = np.broadcast_to(ys0, (b, ht, wt)).copy()
    xs[:2] += rng.uniform(-0.45, 0.45, (2, ht, wt))   # band paths
    ys[:2] += rng.uniform(-0.45, 0.45, (2, ht, wt))
    ys[1] += 2.0 * np.sin(xs0 / 40.0)                 # spread 2-3: band-K
    xs[2:4] = rng.uniform(-30, w + 30, (2, ht, wt))   # slow path
    ys[2:4] = rng.uniform(-30, h + 30, (2, ht, wt))
    xs[4] -= 500.0                                    # fully out of range
    ys[5] += 500.0
    xs, ys = jnp.asarray(xs), jnp.asarray(ys)

    orig = wk._META_FORM
    try:
        for mode in ("edge_zero", "zero_pad"):
            wk._META_FORM = "mono"
            m_mono = np.asarray(jax.jit(
                lambda a, c: wk.tile_meta(a, c, h, w, mode, hp, wp))(xs, ys))
            wk._META_FORM = "block"
            m_block = np.asarray(jax.jit(
                lambda a, c: wk.tile_meta(a, c, h, w, mode, hp, wp))(xs, ys))
            np.testing.assert_array_equal(m_mono, m_block, err_msg=mode)
            assert set(np.unique(m_mono[..., 0])) <= {0, 1, 2, 3, 4}
            # the sinusoidal-y image must exercise the band-K path
            assert (m_mono[1, :, 0] == 2).any(), mode
    finally:
        wk._META_FORM = orig


def test_kernel_gather_pack_close_to_exact(monkeypatch):
    """SNDEPTH_WARP_GATHER=pack (paired-bf16 lane gathers) must match the
    exact kernel to bf16 value tolerance on every path (the weights stay
    f32; only gathered image values are rounded)."""
    import sndepth_tpu.kernels.warp as wk
    cases = []
    rng = np.random.RandomState(11)
    b, h, w, c = 2, 16, 48, 2
    imgs = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = np.stack([xs, ys], -1)[None].repeat(b, 0)
    cases.append((imgs, jnp.asarray(grid + rng.uniform(-2, 2, grid.shape),
                                    jnp.float32)))          # band paths
    cases.append(_rand_case(12))                            # slow path mix
    for mode in ("edge_zero", "zero_pad"):
        for imgs_i, coords_i in cases:
            want = np.asarray(pallas_sampler(imgs_i, coords_i, mode))
            monkeypatch.setattr(wk, "_GATHER", "pack")
            got = np.asarray(pallas_sampler(imgs_i, coords_i, mode))
            monkeypatch.setattr(wk, "_GATHER", "exact")
            np.testing.assert_allclose(got, want, atol=2 ** -7,
                                       err_msg=mode)


def test_photo_pair_gather_pack_close(monkeypatch):
    """The pair photo kernel under pack-mode gathers: loss and coord
    gradients within bf16-image tolerance of the exact kernel."""
    import sndepth_tpu.kernels.warp as wk
    import sndepth_tpu.kernels.photo_loss as PL
    rng = np.random.RandomState(13)
    b, ns, h, w, c = 1, 2, 16, 48, 3
    tgt = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    srcs = jnp.asarray(rng.rand(b, ns, h, w, c), jnp.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = np.stack([xs, ys], -1)[None, None].repeat(ns, 1)
    cf = jnp.asarray(grid + rng.uniform(-2, 2, grid.shape), jnp.float32)
    cb = jnp.asarray(grid - rng.uniform(-2, 2, grid.shape), jnp.float32)

    def run():
        return PL._pair_run(tgt, srcs, cf, cb, 0.85, "edge_zero",
                            need_grad=True)

    loss0, dcf0, dcb0 = run()
    monkeypatch.setattr(wk, "_GATHER", "pack")
    loss1, dcf1, dcb1 = run()
    monkeypatch.setattr(wk, "_GATHER", "exact")
    npix = b * ns * h * w * c
    assert abs(float(loss1) - float(loss0)) / npix < 2 ** -7
    for g1, g0 in ((dcf1, dcf0), (dcb1, dcb0)):
        d = np.abs(np.asarray(g1) - np.asarray(g0))
        # bf16 rounding can flip a DSSIM clip-boundary tie on isolated
        # pixels (gradient jumps by the tie split); bound the bulk
        # tightly and allow rare boundary flips a wider margin.
        assert np.percentile(d, 99) < 0.05
        assert d.max() < 0.5


@pytest.mark.parametrize("case", ["band2fast", "bandk", "random"])
def test_kernel_x1roll_matches(case, monkeypatch):
    """The x1 roll-trick (take_along(roll(table,-1), r0) + collapse
    select) must be path-for-path identical to the r1 gather — including
    the chunk-crossing wrap and the clip-collapsed borders."""
    import sndepth_tpu.kernels.warp as wk
    monkeypatch.setattr(wk, "_X1ROLL", True)
    if case == "band2fast":
        test_kernel_band2_fast_path_matches()
    elif case == "bandk":
        test_kernel_bandk_path_matches()
    else:
        test_kernel_matches_both_modes_random_coords()


def test_photo_pair_plane_matches_exact(monkeypatch):
    """SNDEPTH_PHOTO_PLANE (whole-plane row tables + one-hot blend at
    wtp == _LANE) must match the default pair kernel exactly — loss and
    both coordinate gradients — across fast-band, band-K, and slow-path
    tiles, in both modes (ADVICE r4: this path previously had no CPU
    interpreter parity coverage)."""
    import sndepth_tpu.kernels.photo_loss as PL
    rng = np.random.RandomState(17)
    b, ns, h, w, c = 1, 2, 24, 120, 3          # wtp == 128 == _LANE
    tgt = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    srcs = jnp.asarray(rng.rand(b, ns, h, w, c), jnp.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = np.stack([xs, ys], -1)[None, None].repeat(ns, 1)
    cf = np.asarray(grid + rng.uniform(-0.45, 0.45, grid.shape),
                    np.float32)
    cb = np.asarray(grid - rng.uniform(-0.45, 0.45, grid.shape),
                    np.float32)
    cf[0, 0, ..., 1] += 2.0 * np.sin(xs / 20.0)       # band-K rows
    cb[0, 1] = rng.uniform(-20, 140, cb[0, 1].shape)  # slow-path tiles
    cf, cb = jnp.asarray(cf), jnp.asarray(cb)

    for mode in ("edge_zero", "zero_pad"):
        monkeypatch.setattr(PL, "_PLANE", "0")
        loss0, dcf0, dcb0 = PL._pair_run(tgt, srcs, cf, cb, 0.85, mode,
                                         need_grad=True)
        monkeypatch.setattr(PL, "_PLANE", "1")
        loss1, dcf1, dcb1 = PL._pair_run(tgt, srcs, cf, cb, 0.85, mode,
                                         need_grad=True)
        np.testing.assert_allclose(float(loss1), float(loss0),
                                   rtol=1e-6, err_msg=mode)
        for g1, g0 in ((dcf1, dcf0), (dcb1, dcb0)):
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=mode)
