import numpy as np

from graphtpu.eval.precision import (
    precision_at_k,
    precision_sim_dicts,
    ndcg_sim_dicts,
)
from graphtpu.eval.f1 import topk_ranker_scoring


def test_precision_sim_dicts_realk_semantics():
    gold = {0: [(1, 0.5), (2, 0.4), (3, 1e-12)], 1: [(9, 1e-12)]}
    approx = {0: [(1, 0.3), (7, 0.2)], 1: [(4, 0.9)]}
    # src 0: set1={1,2} (1e-12 filtered), realK=min(20,2)=2, hits={1} -> 0.5
    # src 1: set1={} -> realK=0 -> precision 1.0 (Eval.java:117-118)
    p = precision_sim_dicts(gold, approx, k=20)
    np.testing.assert_allclose(p, (0.5 + 1.0) / 2)


def test_precision_at_k_ids():
    gold = {0: [1, 2, 3, 4], 1: [5, 6]}
    approx = {0: [2, 1, 9, 10], 1: [6, 7]}
    # src0: k=2 -> {1,2}&{2,1}=2/2 ; src1: {5,6}&{6,7}=1/2
    assert precision_at_k(gold, approx, k=2) == (1.0 + 0.5) / 2


def test_ndcg_identity_is_one():
    gold = {0: [(1, 0.5), (2, 0.25), (3, 0.1)]}
    assert abs(ndcg_sim_dicts(gold, gold, k=3) - 1.0) < 1e-12


def test_ndcg_worse_ranking_below_one():
    gold = {0: [(1, 0.9), (2, 0.5), (3, 0.1)]}
    approx = {0: [(3, 0.1), (2, 0.5), (1, 0.9)]}
    v = ndcg_sim_dicts(gold, approx, k=3)
    assert v < 1.0


def test_topk_ranker_protocol_separable():
    """Trivially separable 2-class data must reach near-perfect micro-F1."""
    rng = np.random.default_rng(0)
    n = 200
    x0 = rng.normal(size=(n // 2, 4)) + np.array([4, 0, 0, 0])
    x1 = rng.normal(size=(n // 2, 4)) - np.array([4, 0, 0, 0])
    feats = np.concatenate([x0, x1])
    labels = [[0]] * (n // 2) + [[1]] * (n // 2)
    res = topk_ranker_scoring(
        feats, labels, n_classes=2, train_fractions=[0.5], n_shuffles=2
    )
    for r in res[0.5]:
        assert r["micro"] > 0.95
