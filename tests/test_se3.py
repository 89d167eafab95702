"""Oracle tests for the pure-JAX SE3 library (lietorch replacement)."""

import numpy as np
import jax
import jax.numpy as jnp

from sndepth_tpu.ops import se3


def _rand_tangent(rng, shape=(), scale=0.5):
    return jnp.asarray(rng.uniform(-scale, scale, shape + (6,)),
                       jnp.float32)


def test_identity():
    g = se3.identity((2, 3))
    assert g.shape == (2, 3, 7)
    p = jnp.ones((2, 3, 3))
    np.testing.assert_allclose(np.asarray(se3.act(g, p)), 1.0, atol=1e-7)


def test_exp_log_roundtrip():
    rng = np.random.RandomState(0)
    xi = _rand_tangent(rng, (16,), scale=1.2)
    back = se3.log(se3.exp(xi))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-5)


def test_exp_log_small_angle():
    xi = jnp.array([[1e-7, -2e-7, 3e-7, 1e-8, -1e-8, 2e-8],
                    [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]], jnp.float32)
    back = np.asarray(se3.log(se3.exp(xi)))
    np.testing.assert_allclose(back, np.asarray(xi), atol=1e-9)


def test_mul_inv():
    rng = np.random.RandomState(1)
    g1 = se3.exp(_rand_tangent(rng, (8,)))
    g2 = se3.exp(_rand_tangent(rng, (8,)))
    prod = se3.mul(g1, g2)
    ident = se3.mul(prod, se3.inv(prod))
    want = np.asarray(se3.identity((8,)))
    got = np.asarray(ident)
    # quaternion sign is arbitrary for identity; compare action instead
    p = jnp.asarray(rng.randn(8, 3), jnp.float32)
    np.testing.assert_allclose(np.asarray(se3.act(ident, p)),
                               np.asarray(p), atol=1e-5)


def test_act_matches_matrix():
    rng = np.random.RandomState(2)
    g = se3.exp(_rand_tangent(rng, (5,)))
    p = jnp.asarray(rng.randn(5, 3), jnp.float32)
    via_act = np.asarray(se3.act(g, p))
    m = np.asarray(se3.matrix(g))
    hom = np.concatenate([np.asarray(p), np.ones((5, 1))], -1)
    via_mat = np.einsum("bij,bj->bi", m, hom)[:, :3]
    np.testing.assert_allclose(via_act, via_mat, atol=1e-5)


def test_mul_matches_matrix_product():
    rng = np.random.RandomState(3)
    g1 = se3.exp(_rand_tangent(rng, (4,)))
    g2 = se3.exp(_rand_tangent(rng, (4,)))
    m = np.asarray(se3.matrix(se3.mul(g1, g2)))
    want = np.asarray(se3.matrix(g1)) @ np.asarray(se3.matrix(g2))
    np.testing.assert_allclose(m, want, atol=1e-5)


def test_exp_pure_translation():
    xi = jnp.array([[1.0, 2.0, 3.0, 0.0, 0.0, 0.0]])
    g = np.asarray(se3.exp(xi))
    np.testing.assert_allclose(g[0, :3], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(g[0, 3:], [0, 0, 0, 1], atol=1e-6)


def test_gradients_finite_at_zero():
    def f(xi):
        return jnp.sum(se3.act(se3.exp(xi), jnp.ones((3,))))
    g = np.asarray(jax.grad(f)(jnp.zeros(6)))
    assert np.isfinite(g).all()

    def f2(data):
        return jnp.sum(se3.log(data))
    g2 = np.asarray(jax.grad(f2)(se3.identity(())))
    assert np.isfinite(g2).all()


def test_grad_check_exp():
    from jax.test_util import check_grads
    rng = np.random.RandomState(4)
    xi = _rand_tangent(rng, (3,))
    check_grads(lambda t: se3.act(se3.exp(t), jnp.ones((3, 3))), (xi,),
                order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
