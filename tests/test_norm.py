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
