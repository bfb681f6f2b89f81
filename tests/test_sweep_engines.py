"""Parity + convergence tests for the round-4 sweep engines:
doubleRandomWalk rows, sampled TopSim_doubleSample, TopSim_Dev subset.

Reference protocols: ``Test_u_u_doubleRandomWalk_Sample.java`` (samples
{5..400}, step 1), ``Test_u_u_TopSim_doubleSample.java`` (samples
{5,10,50}, step 1), ``Test_u_u_TopSim_Dev.java`` (samples {10000},
step 3).
"""

import jax
import numpy as np
import pytest

from graphtpu.core.config import DoubleWalkConfig, TopSimConfig
from graphtpu.simrank.doublewalk import (
    doublewalk_simrank,
    doublewalk_simrank_rows,
)
from graphtpu.simrank.meeting import (
    doublesample_similarity,
    doublesample_similarity_mc,
    topsim_dev,
)


def test_doublewalk_rows_step1_matches_dense(small_random):
    """The step-1 histogram-matmul factorisation computes the SAME sums
    as the dense pair loop (sum_{s,s'} 1[a_s==b_s'] == <cnt_a, cnt_b>)."""
    g = small_random
    cfg = DoubleWalkConfig(sample=50, step=1, source_tile=16)
    key = jax.random.key(7)
    dense = doublewalk_simrank(g, cfg, key=key)
    rows = doublewalk_simrank_rows(g, cfg, key=key)
    np.testing.assert_allclose(rows, dense, rtol=1e-5, atol=1e-6)


def test_doublewalk_rows_subset_consistent(small_random):
    """A source subset returns exactly those rows of the full run."""
    g = small_random
    cfg = DoubleWalkConfig(sample=40, step=1, source_tile=16)
    key = jax.random.key(3)
    full = doublewalk_simrank_rows(g, cfg, key=key)
    sub = np.asarray([3, 17, 40, 63], np.int32)
    rows = doublewalk_simrank_rows(g, cfg, key=key, sources=sub)
    np.testing.assert_allclose(rows, full[sub], rtol=1e-5, atol=1e-6)


def test_doublewalk_rows_generic_step_matches_dense(small_random):
    """The blocked generic-step path (step>1) reproduces the dense
    oracle's rows for a subset."""
    g = small_random
    cfg = DoubleWalkConfig(sample=30, step=3, source_tile=16)
    key = jax.random.key(5)
    dense = doublewalk_simrank(g, cfg, key=key)
    sub = np.asarray([0, 9, 33], np.int32)
    rows = doublewalk_simrank_rows(g, cfg, key=key, sources=sub)
    np.testing.assert_allclose(rows, dense[sub], rtol=1e-5, atol=1e-6)


def test_doublesample_mc_converges_to_exact(small_random):
    """The sampled endpoint-mass score converges to the even-split
    (exact transition-mass) similarity as sample grows — the
    convergence axis the reference sweep records."""
    g = small_random
    cfg = TopSimConfig(step=1)
    exact = doublesample_similarity(g, cfg)
    errs = []
    for s in (5, 50, 500):
        mc = doublesample_similarity_mc(g, s, cfg, key=jax.random.key(1))
        errs.append(np.abs(mc - exact).mean())
    assert errs[-1] < errs[0]
    assert errs[-1] < 2e-3


def test_doublesample_mc_subset_rows(small_random):
    g = small_random
    cfg = TopSimConfig(step=2)
    sub = np.asarray([1, 8, 21], np.int32)
    full = doublesample_similarity_mc(g, 20, cfg, key=jax.random.key(9))
    rows = doublesample_similarity_mc(
        g, 20, cfg, key=jax.random.key(9), sources=sub
    )
    np.testing.assert_allclose(rows, full[sub], rtol=1e-5, atol=1e-6)


def test_topsim_dev_subset_matches_full(small_random):
    g = small_random
    cfg = TopSimConfig(sample=500.0, step=2, topk=5, source_tile=16)
    vals_f, idx_f = topsim_dev(g, cfg, key=jax.random.key(2))
    sub = np.asarray([2, 30, 55], np.int32)
    vals_s, idx_s = topsim_dev(g, cfg, key=jax.random.key(2), sources=sub)
    np.testing.assert_allclose(vals_s, vals_f[sub], rtol=1e-5, atol=1e-6)
    assert (idx_s == idx_f[sub]).all()
