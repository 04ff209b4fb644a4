"""Device linear_sum_assignment vs scipy on random matrices."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment as lsa_scipy

from autoinst_tpu.ops.lsa import linear_sum_assignment


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("shape", [(5, 5), (8, 13), (1, 4), (16, 16),
                                   (40, 40), (24, 40)])
def test_matches_scipy_cost(seed, shape):
    rng = np.random.default_rng(seed)
    cost = rng.normal(size=shape).astype(np.float32) * 3
    col4row = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    # valid assignment: distinct columns
    assert len(set(col4row.tolist())) == shape[0]
    ours = cost[np.arange(shape[0]), col4row].sum()
    ri, ci = lsa_scipy(cost)
    np.testing.assert_allclose(ours, cost[ri, ci].sum(), rtol=1e-5, atol=1e-5)


def test_integer_ties():
    cost = np.array([[1, 1, 5], [1, 1, 5]], np.float32)
    col4row = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    assert sorted(col4row.tolist()) == [0, 1]


def test_n_rows_masking():
    rng = np.random.default_rng(3)
    cost = rng.uniform(size=(6, 8)).astype(np.float32)
    col4row = np.asarray(linear_sum_assignment(jnp.asarray(cost), n_rows=4))
    assert (col4row[4:] == -1).all()
    ri, ci = lsa_scipy(cost[:4])
    ours = cost[np.arange(4), col4row[:4]].sum()
    np.testing.assert_allclose(ours, cost[ri, ci].sum(), rtol=1e-5)


def test_hungarian_match_device_vs_host():
    """In-graph matcher agrees with the scipy callback on total cost."""
    from autoinst_tpu.models.maskpls.model import (hungarian_match,
                                                   hungarian_match_host)
    rng = np.random.default_rng(11)
    costs = rng.normal(size=(3, 2, 10, 6)).astype(np.float32)
    a_dev = np.asarray(hungarian_match(jnp.asarray(costs)))
    a_host = np.asarray(hungarian_match_host(jnp.asarray(costs)))
    L, B, Q, T = costs.shape
    for l in range(L):
        for b in range(B):
            cd = costs[l, b][a_dev[l, b], np.arange(T)].sum()
            ch = costs[l, b][a_host[l, b], np.arange(T)].sum()
            np.testing.assert_allclose(cd, ch, rtol=1e-5)
            assert len(set(a_dev[l, b].tolist())) == T  # distinct queries
