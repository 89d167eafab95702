"""BlockedGroupNorm vs flax nn.GroupNorm: values + grads, f32/bf16,
grouped and instance (group_size=1) forms, identical param trees."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from sndepth_tpu.ops.norm import BlockedGroupNorm


@pytest.mark.parametrize("cfg", [
    dict(num_groups=8, c=128),            # the pathological C//g=16 case
    dict(num_groups=32, c=256),
    dict(num_groups=None, group_size=1, c=64),   # instance norm (RAFT3D)
])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_blocked_group_norm_matches_flax(cfg, dtype):
    cfg = dict(cfg)
    c = cfg.pop("c")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 10, c) * 2 + 0.5, jnp.float32)

    ref = nn.GroupNorm(dtype=dtype, **cfg)
    got = BlockedGroupNorm(dtype=dtype, **cfg)
    v = ref.init(jax.random.PRNGKey(0), x)
    # Same param tree: scale/bias (C,)
    v2 = {"params": {"scale": v["params"]["scale"] + 0.3,
                     "bias": v["params"]["bias"] - 0.1}}

    y_ref = ref.apply(v2, x)
    y_got = got.apply(v2, x)
    atol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(y_got, np.float32),
                               np.asarray(y_ref, np.float32), atol=atol)

    def loss(mod):
        def f(params, xx):
            return jnp.sum(jnp.cos(
                mod.apply({"params": params}, xx).astype(jnp.float32)))
        return f

    g_ref = jax.grad(loss(ref), argnums=(0, 1))(v2["params"], x)
    g_got = jax.grad(loss(got), argnums=(0, 1))(v2["params"], x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_got)):
        # bf16: the two formulations round the normalize chain in a
        # different order; a handful of elements land one ulp apart.
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32),
                                   atol=4e-3 if dtype == jnp.bfloat16
                                   else 1e-4, rtol=1e-3)


@pytest.mark.parametrize("c,w", [(24, 40), (40, 18), (64, 16), (144, 16),
                                 (128, 8)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_lane_folded_batchnorm_matches_flax(monkeypatch, c, w, dtype):
    """ops.norm.BatchNorm (lane-folded, SNDEPTH_BN_FOLD=1) vs
    nn.BatchNorm: forward train/eval, grads, and the EMA update."""
    from sndepth_tpu.ops.norm import BatchNorm, _bn_fold_factor
    monkeypatch.setenv("SNDEPTH_BN_FOLD", "1")
    assert _bn_fold_factor((2, 6, w, c)) > 1 or c == 128

    rng = np.random.RandomState(c + w)
    x = jnp.asarray(rng.randn(2, 6, w, c).astype(np.float32) * 2 + 1,
                    dtype)
    ref = nn.BatchNorm(use_running_average=False, epsilon=1e-3,
                       dtype=dtype)
    got = BatchNorm(use_running_average=False, epsilon=1e-3, dtype=dtype)
    v = ref.init(jax.random.PRNGKey(0), x)
    # param/collection trees must be identical (drop-in guarantee)
    v2 = got.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))

    y_ref, m_ref = ref.apply(v, x, mutable=["batch_stats"])
    y_got, m_got = got.apply(v, x, mutable=["batch_stats"])
    atol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(y_got, np.float32),
                               np.asarray(y_ref, np.float32), atol=atol)
    for a, b in zip(jax.tree_util.tree_leaves(m_ref),
                    jax.tree_util.tree_leaves(m_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)

    # eval mode uses the running stats
    er = nn.BatchNorm(use_running_average=True, epsilon=1e-3, dtype=dtype)
    eg = BatchNorm(use_running_average=True, epsilon=1e-3, dtype=dtype)
    ye_ref = er.apply({**v, **m_ref}, x)
    ye_got = eg.apply({**v, **m_ref}, x)
    np.testing.assert_allclose(np.asarray(ye_got, np.float32),
                               np.asarray(ye_ref, np.float32), atol=atol)

    def loss(mod):
        def f(params, xx):
            y, _ = mod.apply({**{"params": params},
                              "batch_stats": v["batch_stats"]}, xx,
                             mutable=["batch_stats"])
            return jnp.sum(jnp.cos(y.astype(jnp.float32)))
        return f

    tr = nn.BatchNorm(use_running_average=False, epsilon=1e-3, dtype=dtype)
    tg = BatchNorm(use_running_average=False, epsilon=1e-3, dtype=dtype)
    g_ref = jax.grad(loss(tr), argnums=(0, 1))(v["params"], x)
    g_got = jax.grad(loss(tg), argnums=(0, 1))(v["params"], x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_got)):
        # bf16 dx: a couple of elements land one-two ulps (2^-7 at
        # magnitude ~1) apart from the different normalize round order.
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32),
                                   atol=1.6e-2 if dtype == jnp.bfloat16
                                   else 1e-4, rtol=1e-3)


def test_lane_folded_batchnorm_default_off():
    """With the knob unset the fold factor is 1 (identity layout)."""
    from sndepth_tpu.ops.norm import _bn_fold_factor
    import os
    assert os.environ.get("SNDEPTH_BN_FOLD", "0") == "0"
    assert _bn_fold_factor((2, 6, 40, 24)) == 1
