"""ms_deformable_attention chunked-query path."""
import jax.numpy as jnp
import numpy as np


def test_msda_chunked_matches_unchunked(monkeypatch):
    """The lax.map query-chunked path == the direct path exactly."""
    from sndepth_tpu.models import deformable as D
    rng = np.random.RandomState(2)
    shapes = [(6, 8), (3, 4)]
    nk = sum(h * w for h, w in shapes)
    b, heads, dim, nq, P = 2, 4, 8, 24, 3
    value = jnp.asarray(rng.randn(b, nk, heads, dim), jnp.float32)
    loc = jnp.asarray(rng.rand(b, nq, heads, len(shapes), P, 2),
                      jnp.float32)
    wgt = jnp.asarray(rng.rand(b, nq, heads, len(shapes), P), jnp.float32)

    base = D.ms_deformable_attention(value, shapes, loc, wgt)
    monkeypatch.setattr(D, "_Q_CHUNK_THRESHOLD", 8)
    monkeypatch.setattr(D, "_Q_CHUNK_TARGET", 8)
    got = D.ms_deformable_attention(value, shapes, loc, wgt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=1e-6)


def test_msda_chunked_non_divisible_nq(monkeypatch):
    """nq not divisible by the chunk count still chunks (padded) and is
    exact — the reference-scale OOM guard must not be shape-dependent
    (ADVICE r3)."""
    from sndepth_tpu.models import deformable as D
    rng = np.random.RandomState(3)
    shapes = [(6, 8), (3, 4)]
    nk = sum(h * w for h, w in shapes)
    b, heads, dim, nq, P = 2, 4, 8, 25, 3   # 25 % ceil(25/8)=4 != 0
    value = jnp.asarray(rng.randn(b, nk, heads, dim), jnp.float32)
    loc = jnp.asarray(rng.rand(b, nq, heads, len(shapes), P, 2),
                      jnp.float32)
    wgt = jnp.asarray(rng.rand(b, nq, heads, len(shapes), P), jnp.float32)

    base = D.ms_deformable_attention(value, shapes, loc, wgt)
    monkeypatch.setattr(D, "_Q_CHUNK_THRESHOLD", 8)
    monkeypatch.setattr(D, "_Q_CHUNK_TARGET", 8)
    got = D.ms_deformable_attention(value, shapes, loc, wgt)
    assert got.shape == base.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=1e-6)
