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


def test_msda3d_chunked_dense_matches(monkeypatch):
    """The chunked-dense path (Dense projections inside the checkpointed
    chunk body — the reference-scale memory fix) must match the full path
    exactly, with an identical param tree, values AND grads."""
    import jax
    from sndepth_tpu.models import deformable as D
    rng = np.random.RandomState(5)
    shapes = ((5, 7), (3, 4))
    nk = sum(h * w for h, w in shapes)
    b, nq, c, dpts = 2, 40, 32, 2
    mod = D.MSDeformableAttention3D(embed_dims=c, num_heads=4,
                                    num_levels=2, num_points=4)
    q = jnp.asarray(rng.randn(b, nq, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, nk, c), jnp.float32)
    ref = jnp.asarray(rng.rand(b, nq, dpts, 2), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), q, v, ref, shapes)

    def loss(p):
        return jnp.sum(jnp.sin(mod.apply(p, q, v, ref, shapes)))

    base, gbase = jax.value_and_grad(loss)(params)
    monkeypatch.setattr(D, "_Q_CHUNK_THRESHOLD", 8)
    monkeypatch.setattr(D, "_Q_CHUNK_TARGET", 16)
    p2 = mod.init(jax.random.PRNGKey(0), q, v, ref, shapes)
    assert (jax.tree_util.tree_structure(p2)
            == jax.tree_util.tree_structure(params))
    got, ggot = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(got), float(base), rtol=1e-6)
    for a, bb in zip(jax.tree_util.tree_leaves(ggot),
                     jax.tree_util.tree_leaves(gbase)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-5)


def test_tsa_chunked_dense_matches(monkeypatch):
    import jax
    from sndepth_tpu.models import deformable as D
    rng = np.random.RandomState(6)
    b, nq, c = 1, 36, 32
    hh, ww = 6, 6
    mod = D.TemporalSelfAttention(embed_dims=c, num_heads=4)
    q = jnp.asarray(rng.randn(b, nq, c), jnp.float32)
    prev = jnp.asarray(rng.randn(b, nq, c), jnp.float32)
    ref = jnp.asarray(rng.rand(b, nq, 1, 2), jnp.float32)
    shapes = ((hh, ww),)
    params = mod.init(jax.random.PRNGKey(0), q, prev, ref, shapes)

    def loss(p):
        return jnp.sum(jnp.sin(mod.apply(p, q, prev, ref, shapes)))

    base, gbase = jax.value_and_grad(loss)(params)
    monkeypatch.setattr(D, "_Q_CHUNK_THRESHOLD", 8)
    monkeypatch.setattr(D, "_Q_CHUNK_TARGET", 16)
    p2 = mod.init(jax.random.PRNGKey(0), q, prev, ref, shapes)
    assert (jax.tree_util.tree_structure(p2)
            == jax.tree_util.tree_structure(params))
    got, ggot = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(got), float(base), rtol=1e-6)
    for a, bb in zip(jax.tree_util.tree_leaves(ggot),
                     jax.tree_util.tree_leaves(gbase)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-5)
