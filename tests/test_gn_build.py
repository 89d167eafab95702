"""Pallas fused Gauss-Newton build vs the XLA blocked accumulate."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _inputs(seed=0, b=1, h=6, w=9):
    rng = np.random.RandomState(seed)
    n = h * w
    rot = (np.eye(3)[None, None]
           + 0.05 * rng.randn(b, n, 3, 3)).astype(np.float32)
    trans = rng.randn(b, n, 3).astype(np.float32) * 0.1
    trans[..., 2] += 2.0
    x = rng.randn(b, n, 32).astype(np.float32) * 0.3
    sq = np.sum(x * x, -1)
    gy = np.repeat(np.arange(h), w).astype(np.int32)
    gx = np.tile(np.arange(w), h).astype(np.int32)
    X = rng.rand(b, n, 3).astype(np.float32)
    X[..., 2] += 1.0
    tgt = rng.randn(b, n, 3).astype(np.float32)
    wgt = rng.rand(b, n, 3).astype(np.float32)
    intr4 = np.array([[20.0, 21.0, 4.0, 3.0]], np.float32)
    return tuple(jnp.asarray(a) for a in
                 (rot, trans, x, sq, gy, gx, X, tgt, wgt, intr4))


def test_gn_build_pallas_matches_xla():
    from sndepth_tpu.kernels.gn_build import gn_build_hg
    from sndepth_tpu.models.raft3d import _hg_xla
    args = _inputs()
    radius = 3
    H0, g0 = _hg_xla(*args, radius, 16)          # blocked XLA oracle
    H1, g1 = gn_build_hg(*args, radius)          # interpreter on CPU
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=2e-4, atol=2e-4)
    # H must be exactly symmetric as assembled
    np.testing.assert_array_equal(np.asarray(H1),
                                  np.asarray(H1).swapaxes(-1, -2))


def test_xla_build_grads_are_finite():
    """Regression: jnp.sqrt(attn*w)'s inf derivative at the radius-masked
    pairs NaN-poisoned every gradient through _hg_xla for two rounds
    (hidden because the backward test compared two NaN paths and
    assert_allclose treats NaN == NaN as equal). _sqrt0 fixes it."""
    from sndepth_tpu.models import raft3d as R
    args = _inputs(seed=2)

    def loss(*diff):
        H, g = R._hg_xla(diff[0], diff[1], diff[2], diff[3], args[4],
                         args[5], diff[4], diff[5], diff[6], diff[7],
                         3, 16)                   # radius 3 -> masked pairs
        return jnp.sum(jnp.sin(H)) + jnp.sum(g * g)

    diff = (args[0], args[1], args[2], args[3], args[6], args[7],
            args[8], args[9])
    grads = jax.grad(loss, argnums=tuple(range(8)))(*diff)
    for i, a in enumerate(grads):
        assert np.isfinite(np.asarray(a)).all(), f"arg {i} grad not finite"


def _compare_backward_vs_xla(radius):
    """Hybrid custom-VJP grads (all 8 diff args) vs differentiating the
    XLA build directly."""
    from sndepth_tpu.models import raft3d as R
    args = _inputs(seed=1)

    def loss_hybrid(rot, trans, x, sq, X, tgt, wgt, intr4):
        H, g = R._gn_hg_hybrid(rot, trans, x, sq,
                               args[4].astype(jnp.float32),
                               args[5].astype(jnp.float32),
                               X, tgt, wgt, intr4, radius, 16)
        return jnp.sum(jnp.sin(H)) + jnp.sum(g * g)

    def loss_xla(rot, trans, x, sq, X, tgt, wgt, intr4):
        H, g = R._hg_xla(rot, trans, x, sq, args[4], args[5],
                         X, tgt, wgt, intr4, radius, 16)
        return jnp.sum(jnp.sin(H)) + jnp.sum(g * g)

    diff = (args[0], args[1], args[2], args[3], args[6], args[7],
            args[8], args[9])
    g_h = jax.grad(loss_hybrid, argnums=tuple(range(8)))(*diff)
    g_x = jax.grad(loss_xla, argnums=tuple(range(8)))(*diff)
    for i, (a, b) in enumerate(zip(g_h, g_x)):
        assert np.isfinite(np.asarray(a)).all(), f"arg {i} grad not finite"
        # Grad magnitudes reach ~1e4; the two backwards accumulate the
        # same pair terms in different orders (Pallas pairwise running
        # sums vs XLA sqrt-factored Grams), so agreement is relative.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f"arg {i}")


def test_gn_pallas_backward_matches_xla_grads(monkeypatch):
    """The fused Pallas backward kernels (default) against the XLA
    oracle, over all eight differentiable arguments."""
    monkeypatch.setenv("SNDEPTH_GN_BWD", "pallas")
    for radius in (3, 100):        # masked pairs / all-pairs regimes
        _compare_backward_vs_xla(radius)


def test_gn_xla_backward_fallback_matches(monkeypatch):
    """SNDEPTH_GN_BWD=xla re-derives through the XLA accumulate."""
    monkeypatch.setenv("SNDEPTH_GN_BWD", "xla")
    _compare_backward_vs_xla(3)

def test_gauss_newton_dispatch_guards_embedding_width(monkeypatch):
    """bilaplacian mode (ae_dim=16) must never reach the Pallas kernel,
    whose layout hardcodes the 32-wide embedding (_EMB/_NJROWS) — on a
    TPU backend at n>2048 the dispatch falls back to the XLA path."""
    from sndepth_tpu.models import raft3d as R

    calls = {"hybrid": 0, "xla": 0}

    def fake_hybrid(*a, **k):
        calls["hybrid"] += 1
        raise AssertionError("16-wide ae routed to the Pallas kernel")

    def fake_xla(rot, trans, *a, **k):
        calls["xla"] += 1
        b, n = rot.shape[:2]
        return (jnp.tile(jnp.eye(6, dtype=jnp.float32), (b, n, 1, 1)),
                jnp.zeros((b, n, 6), jnp.float32))

    monkeypatch.setattr(R, "_gn_hg_hybrid", fake_hybrid)
    monkeypatch.setattr(R, "_hg_xla", fake_xla)
    monkeypatch.setattr(R.jax, "default_backend", lambda: "tpu")

    b, h, w = 1, 48, 48                     # n = 2304 > 2048
    rng = np.random.RandomState(0)
    Ts = jnp.concatenate([jnp.zeros((b, h, w, 3)),
                          jnp.zeros((b, h, w, 3)),
                          jnp.ones((b, h, w, 1))], -1)
    tgt = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    wgt = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    depth = jnp.ones((b, h, w), jnp.float32) * 2.0
    K = jnp.asarray([[20.0, 21.0, 4.0, 3.0]], np.float32)

    # 16-wide ae (bilaplacian) -> XLA path only
    ae16 = jnp.asarray(rng.randn(b, h, w, 16).astype(np.float32))
    R.gauss_newton_step(Ts, ae16, tgt, wgt, depth, K, radius=3)
    assert calls == {"hybrid": 0, "xla": 1}

    # 32-wide ae -> the Pallas hybrid is selected
    ae32 = jnp.asarray(rng.randn(b, h, w, 32).astype(np.float32))
    with pytest.raises(AssertionError, match="routed"):
        R.gauss_newton_step(Ts, ae32, tgt, wgt, depth, K, radius=3)
    assert calls["hybrid"] == 1
