"""Walk-statistics diagnostics (RandomWalkTest.java equivalents)."""

import jax
import numpy as np
import pytest

import graphtpu
from graphtpu.bench.walkstats import (
    double_meet_probability,
    pair_simrank_mc,
    path_probability,
    random_path,
    sample_double_meet_probability,
    sample_path_probability,
)
from graphtpu.simrank.exact import exact_simrank_reference_oracle


@pytest.fixture(scope="module")
def k6():
    """Complete graph K6: every transition probability is exactly 1/5."""
    edges = np.array([(i, j) for i in range(6) for j in range(6) if i < j])
    return graphtpu.build_graph(edges, n_nodes=6)


def test_path_probability_exact_on_complete_graph(k6):
    path = np.array([0, 3, 1, 4])
    assert path_probability(k6, path) == pytest.approx((1 / 5) ** 3)


def test_sampled_path_probability_matches_exact(k6):
    path = np.array([0, 3, 1])
    exact = path_probability(k6, path)  # (1/5)^2 = 0.04
    est = sample_path_probability(k6, path, samples=50000, key=jax.random.key(1))
    # binomial 3-sigma band around p=0.04 at n=50k is ~±0.0026
    assert abs(est - exact) < 0.004


def test_double_meet_probability(k6):
    path = np.array([0, 2, 4])  # heads 0->2, tails 4->2: (1/5)*(1/5)
    exact = double_meet_probability(k6, path)
    assert exact == pytest.approx(1 / 25)
    est = sample_double_meet_probability(
        k6, path, samples=50000, key=jax.random.key(2)
    )
    assert abs(est - exact) < 0.005


def test_random_path_edges_valid(karate):
    path = random_path(karate, src=0, length=10, key=jax.random.key(3))
    cols = np.asarray(karate.col)
    rp = np.asarray(karate.row_ptr)
    for a, b in zip(path[:-1], path[1:]):
        if b < 0:
            break
        assert b in cols[rp[a] : rp[a + 1]]


def test_pair_simrank_mc_brackets_exact(karate):
    sim = exact_simrank_reference_oracle(karate, c=0.6, iterations=3)
    # pick the strongest off-diagonal pair for a high-signal target
    i, j = np.unravel_index(np.argmax(sim), sim.shape)
    mean, std = pair_simrank_mc(
        karate, int(i), int(j), c=0.6, step=3, samples=4000, times=5,
        key=jax.random.key(4),
    )
    # the truncated single-walk estimator is unbiased for the first-meeting
    # expansion; allow generous MC + truncation slack
    assert 0.2 * sim[i, j] < mean < 3.0 * sim[i, j]
    assert std < mean  # concentrates across repeats


def test_pair_simrank_same_node_rejected(karate):
    with pytest.raises(ValueError):
        pair_simrank_mc(karate, 3, 3)
