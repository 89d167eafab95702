"""On-device auction LAP vs scipy Hungarian (optimality + plumbing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sndepth_tpu.losses.lap import auction_lap


def _opt_cost(cost, valid):
    idx = np.nonzero(valid)[0]
    if not len(idx):
        return 0.0
    r, c = linear_sum_assignment(cost[:, idx])
    return float(cost[r, idx[c]].sum())


def _auction_cost(cost, valid, rows):
    rows = np.asarray(rows)
    valid = np.asarray(valid)
    # every valid column assigned, to distinct rows
    assert (rows[valid] >= 0).all()
    assert (rows[~valid] == -1).all()
    used = rows[valid]
    assert len(set(used.tolist())) == len(used)
    return float(sum(cost[rows[g], g] for g in np.nonzero(valid)[0]))


@pytest.mark.parametrize("nq,ng,seed", [(6, 4, 0), (32, 10, 1),
                                        (901, 40, 2), (16, 16, 3)])
def test_auction_near_optimal(nq, ng, seed):
    rng = np.random.RandomState(seed)
    cost = (rng.rand(nq, ng) * 20).astype(np.float32)
    valid = rng.rand(ng) > 0.25
    valid[0] = True
    rows = auction_lap(jnp.asarray(cost), jnp.asarray(valid))
    got = _auction_cost(cost, valid, rows)
    want = _opt_cost(cost, valid)
    assert got <= want + valid.sum() * 1e-3 + 1e-5


def test_auction_with_forbidden_rows():
    """Pinned/excluded query slots are masked with 1e9 by match_frame;
    the eps schedule must not blow up on them."""
    rng = np.random.RandomState(4)
    cost = (rng.rand(24, 6) * 5).astype(np.float32)
    cost[:10, :] = 1e9          # first 10 rows excluded
    valid = np.ones(6, bool)
    rows = auction_lap(jnp.asarray(cost), jnp.asarray(valid))
    got = _auction_cost(cost, valid, rows)
    want = _opt_cost(cost, valid)
    assert (np.asarray(rows) >= 10).all()
    assert got <= want + 6e-3


def test_auction_all_invalid_and_jit_vmap():
    rng = np.random.RandomState(5)
    cost = rng.rand(8, 5).astype(np.float32)
    rows = auction_lap(jnp.asarray(cost), jnp.zeros(5, bool))
    assert (np.asarray(rows) == -1).all()

    batch_cost = jnp.asarray(rng.rand(3, 12, 5).astype(np.float32))
    batch_valid = jnp.asarray(rng.rand(3, 5) > 0.3)
    rows = jax.jit(jax.vmap(auction_lap))(batch_cost, batch_valid)
    for b in range(3):
        got = _auction_cost(np.asarray(batch_cost[b]),
                            np.asarray(batch_valid[b]), rows[b])
        want = _opt_cost(np.asarray(batch_cost[b]),
                         np.asarray(batch_valid[b]))
        assert got <= want + 5e-3


def test_hungarian_match_backends_agree():
    """track_loss.hungarian_match (auction default) equals the scipy
    reference on a well-separated instance."""
    from sndepth_tpu.losses import track_loss as tl
    rng = np.random.RandomState(6)
    cost = (rng.rand(40, 8) * 10).astype(np.float32)
    valid = np.array([True] * 6 + [False] * 2)
    rows, cols = tl.hungarian_match(jnp.asarray(cost), jnp.asarray(valid))
    idx = np.nonzero(valid)[0]
    r, c = linear_sum_assignment(cost[:, idx])
    want = np.full(8, -1)
    want[idx[c]] = r
    np.testing.assert_array_equal(np.asarray(rows), want)
    np.testing.assert_array_equal(np.asarray(cols),
                                  np.where(want >= 0, np.arange(8), -1))
