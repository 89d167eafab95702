"""Serving export: serialized StableHLO artifact roundtrips and serves
the flagship disparity inference without model code."""

import jax
import jax.numpy as jnp
import numpy as np


def test_export_artifact_roundtrip_dispnet(tmp_path):
    from sndepth_tpu.models.dispnet import DispNetS
    from sndepth_tpu.serving import export as sx

    net = DispNetS(dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 64, 3),
                    jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)

    def forward(params, img):
        return net.apply(params, img)[0]

    want = forward(variables, x)
    art = sx.save_artifact(str(tmp_path / "m"), forward, variables, [x])
    fn, params, meta = sx.load_artifact(art)
    got = fn(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    assert meta["inputs"][0]["shape"] == [1, 32, 64, 3]


def test_export_rejects_wrong_shape(tmp_path):
    import pytest

    from sndepth_tpu.serving import export as sx

    def f(params, x):
        return params["w"] * x

    params = {"w": jnp.asarray(2.0)}
    x = jnp.ones((4, 4))
    art = sx.save_artifact(str(tmp_path / "m"), f, params, [x])
    fn, p, _ = sx.load_artifact(art)
    np.testing.assert_allclose(np.asarray(fn(p, x)), 2 * np.ones((4, 4)))
    with pytest.raises(ValueError):
        fn(p, jnp.ones((3, 3)))
