import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphtpu
from graphtpu.core.config import (
    DoubleWalkConfig,
    SimRankConfig,
    TopSimConfig,
    UniWalkConfig,
)
from graphtpu.simrank.exact import (
    exact_simrank,
    exact_simrank_reference_oracle,
    weighted_simrank,
    simrank_topk,
)
from graphtpu.simrank.uniwalk import uniwalk_simrank, uniwalk_simrank_reuse
from graphtpu.simrank.doublewalk import doublewalk_simrank
from graphtpu.simrank.topsim import topsim_simrank, _expand_frontier


def topk_precision(sim_a: np.ndarray, sim_b: np.ndarray, k: int) -> float:
    """Mean per-row overlap of top-k index sets (rows with any signal)."""
    hits, total = 0, 0
    for r in range(sim_a.shape[0]):
        ia = set(np.argsort(-sim_a[r])[:k].tolist())
        ib = set(np.argsort(-sim_b[r])[:k].tolist())
        if sim_a[r].max() <= 0:
            continue
        hits += len(ia & ib)
        total += k
    return hits / max(total, 1)


# ---------------------------------------------------------------- exact


def test_exact_matches_reference_oracle(small_random):
    g = small_random
    got = np.asarray(exact_simrank(g, SimRankConfig(iterations=3)))
    want = exact_simrank_reference_oracle(g, c=0.6, iterations=3)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_exact_matches_oracle_with_isolated_node():
    g = graphtpu.build_graph(np.array([[0, 1], [1, 2], [3, 1]]), n_nodes=5)
    got = np.asarray(exact_simrank(g, SimRankConfig(iterations=4)))
    want = exact_simrank_reference_oracle(g, c=0.6, iterations=4)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert (got[4] == 0).all() and (got[:, 4] == 0).all()


def test_directed_simrank_matches_oracle():
    from graphtpu.simrank.exact import directed_simrank_reference_oracle

    rng = np.random.default_rng(3)
    edges = rng.integers(0, 24, size=(90, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    dg = graphtpu.build_graph(edges, n_nodes=24, directed=True)
    got = np.asarray(exact_simrank(dg, SimRankConfig(iterations=4)))
    want = directed_simrank_reference_oracle(dg, c=0.6, iterations=4)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_directed_simrank_differs_from_out_neighbour_form():
    # a graph where in- and out-neighbourhoods differ: star i->0 for all i
    edges = np.array([[i, 0] for i in range(1, 6)])
    dg = graphtpu.build_graph(edges, n_nodes=6, directed=True)
    s = np.asarray(exact_simrank(dg, SimRankConfig(iterations=3)))
    # all sources share the single in-neighbourless... rather: nodes 1..5
    # have no in-neighbours -> similarity 0 rows; node 0's row is 0 too
    assert s[1].max() == 0.0
    # reversed edges: nodes 1..5 all have in-neighbour {0} -> sim = C
    dg2 = graphtpu.build_graph(edges[:, ::-1], n_nodes=6, directed=True)
    s2 = np.asarray(exact_simrank(dg2, SimRankConfig(iterations=3)))
    np.testing.assert_allclose(s2[1, 2], 0.6, atol=1e-6)


def test_weighted_simrank_reduces_to_unweighted():
    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 0]])
    g_u = graphtpu.build_graph(edges, n_nodes=4)
    g_w = graphtpu.build_graph(edges, np.ones(4, np.float32), n_nodes=4)
    a = np.asarray(exact_simrank(g_u, SimRankConfig(iterations=5)))
    b = np.asarray(
        weighted_simrank(g_w)
    )  # 50 iters; compare structure on converged entries loosely
    # with equal weights the operators are identical; compare same-iteration
    b5 = np.asarray(exact_simrank(g_w, SimRankConfig(iterations=5), weighted=True))
    np.testing.assert_allclose(a, b5, atol=1e-6)
    assert b.shape == (4, 4)


def test_simrank_topk_extraction(small_random):
    sim = np.asarray(exact_simrank(small_random))
    vals, idx = simrank_topk(jnp.asarray(sim), 5)
    assert vals.shape == (64, 5)
    # descending order per row
    assert (np.diff(vals, axis=1) <= 1e-7).all()


# ---------------------------------------------------------------- uniwalk


def test_uniwalk_bipartite_parity(ring16):
    """On a cycle (bipartite), targets at odd distance are unreachable at
    even walk positions -> exactly zero similarity, like exact SimRank."""
    dense = uniwalk_simrank(
        ring16, UniWalkConfig(sample=500, step=3, source_tile=16), dense=True
    )
    for v in range(16):
        for u in range(16):
            if (u - v) % 2 == 1:
                assert dense[v, u] == 0.0


def test_uniwalk_ranking_matches_exact(small_random):
    g = small_random
    exact = np.asarray(exact_simrank(g, SimRankConfig(iterations=3)))
    dense = uniwalk_simrank(
        g, UniWalkConfig(sample=4000, step=3, source_tile=32), dense=True
    )
    p = topk_precision(exact, dense, k=5)
    assert p > 0.55, p


def test_uniwalk_topk_stream_equals_dense(small_random):
    g = small_random
    cfg = UniWalkConfig(sample=500, step=2, source_tile=16)
    vals, idx = uniwalk_simrank(g, cfg, key=jax.random.key(5))
    dense = uniwalk_simrank(g, cfg, key=jax.random.key(5), dense=True)
    for r in range(g.n_nodes):
        np.testing.assert_allclose(
            np.sort(vals[r])[::-1], np.sort(dense[r])[-cfg.topk:][::-1], atol=1e-6
        )


def test_uniwalk_reuse_runs_and_ranks(small_random):
    g = small_random
    exact = np.asarray(exact_simrank(g, SimRankConfig(iterations=3)))
    dense = uniwalk_simrank_reuse(
        g, UniWalkConfig(sample=4000, step=3, reuse_times=4)
    )
    p = topk_precision(exact, dense, k=5)
    assert p > 0.4, p


def test_uniwalk_reuse_topk_equals_dense(small_random):
    """The scatter-free top-k reuse path must reproduce the dense oracle
    value-for-value on the SAME walks."""
    from graphtpu.simrank.uniwalk import uniwalk_simrank_reuse_topk
    from graphtpu.walks.walker import uniform_walks

    g = small_random
    cfg = UniWalkConfig(sample=400, step=2, reuse_times=4, topk=5)
    times = cfg.reuse_times
    wpn = cfg.sample // times
    starts = jnp.repeat(jnp.arange(g.n_nodes, dtype=jnp.int32), wpn)
    walks = uniform_walks(
        g, starts, 2 * cfg.step + times - 1, jax.random.key(11)
    )
    dense = uniwalk_simrank_reuse(g, cfg, walks=walks)
    vals, idx = uniwalk_simrank_reuse_topk(g, cfg, walks=walks)
    for r in range(g.n_nodes):
        np.testing.assert_allclose(
            np.sort(vals[r])[::-1],
            np.sort(dense[r])[-cfg.topk:][::-1],
            atol=1e-5,
        )
        # every reported (idx, val) pair must match the dense cell
        for j in range(cfg.topk):
            if idx[r, j] >= 0:
                np.testing.assert_allclose(
                    vals[r, j], dense[r, idx[r, j]], atol=1e-5
                )


# ---------------------------------------------------------------- doublewalk


def test_doublewalk_symmetric_and_bipartite(ring16):
    sim = doublewalk_simrank(ring16, DoubleWalkConfig(sample=100, step=3, source_tile=8))
    np.testing.assert_allclose(sim, sim.T, atol=1e-6)
    for v in range(16):
        for u in range(16):
            if (u - v) % 2 == 1:
                assert sim[v, u] == 0.0


def test_doublewalk_ranking(small_random):
    g = small_random
    exact = np.asarray(exact_simrank(g, SimRankConfig(iterations=3)))
    sim = doublewalk_simrank(g, DoubleWalkConfig(sample=150, step=3, source_tile=16))
    p = topk_precision(exact, sim, k=5)
    assert p > 0.45, p


# ---------------------------------------------------------------- topsim


def test_expand_frontier_mass_conservation_and_split(small_random):
    g = small_random
    rp, col = np.asarray(g.row_ptr), np.asarray(g.deg)
    src = 3
    d = int(col[src])
    paths = jnp.full((1, 64, 3), -1, jnp.int32).at[0, 0, 0].set(src)
    mass = jnp.zeros((1, 64)).at[0, 0].set(100.0)
    p2, m2, dropped = _expand_frontier(g, paths, mass, 0, jax.random.key(0))
    m2 = np.asarray(m2)
    assert abs(m2.sum() - 100.0) < 1e-4
    assert float(np.asarray(dropped)[0]) < 1e-4
    # 100 >= deg -> even split over exactly deg children
    assert (m2 > 0).sum() == d
    np.testing.assert_allclose(m2[m2 > 0], 100.0 / d)
    kids = np.asarray(p2)[0, :d, 1]
    np.testing.assert_array_equal(
        np.sort(kids), np.sort(np.asarray(g.col)[rp[src]: rp[src] + d])
    )


def test_expand_frontier_sampled_branch():
    # star: center 0 with 8 leaves; mass 3.5 < deg 8 -> ceil=4 children
    edges = np.array([[0, i] for i in range(1, 9)])
    g = graphtpu.build_graph(edges, n_nodes=9)
    paths = jnp.full((1, 16, 2), -1, jnp.int32).at[0, 0, 0].set(0)
    mass = jnp.zeros((1, 16)).at[0, 0].set(3.5)
    p2, m2, _ = _expand_frontier(g, paths, mass, 0, jax.random.key(1))
    m2 = np.asarray(m2)
    assert (m2 > 0).sum() == 4
    np.testing.assert_allclose(m2[m2 > 0], 3.5 / 4)
    assert all(1 <= x <= 8 for x in np.asarray(p2)[0, :4, 1])


def test_topsim_ranking_beats_noise(small_random):
    g = small_random
    exact = np.asarray(exact_simrank(g, SimRankConfig(iterations=3)))
    dense = topsim_simrank(
        g,
        TopSimConfig(sample=2000.0, step=3, source_tile=8),
        sources=np.arange(32),
        dense=True,
    )
    p = topk_precision(exact[:32], dense, k=5)
    assert p > 0.6, p


def test_weighted_simrank_matches_weighted_oracle():
    from graphtpu.simrank.exact import weighted_simrank_reference_oracle

    rng = np.random.default_rng(7)
    edges = rng.integers(0, 20, size=(60, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    wts = rng.random(len(edges)).astype(np.float32) + 0.1
    g = graphtpu.build_graph(edges, wts, n_nodes=20)
    got = np.asarray(
        exact_simrank(g, SimRankConfig(iterations=4), weighted=True)
    )
    want = weighted_simrank_reference_oracle(g, c=0.6, iterations=4)
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_topsim_enumerate_engine(small_random):
    """enumerate_all == budget-splitting with an inexhaustible budget.

    TopSim_Enumerate.java:101-129 is TopSim_singleSample with the
    ``sample >= degree`` guard dropped; with a budget so large the guard
    always passes, the two engines take identical (deterministic)
    even-split branches, so their outputs must agree exactly.
    """
    g = small_random
    srcs = np.arange(8)
    kw = dict(step=2, source_tile=8, frontier_capacity=4096, topk=10)
    enum = topsim_simrank(
        g, TopSimConfig(sample=1e9, enumerate_all=True, **kw),
        sources=srcs, dense=True,
    )
    huge = topsim_simrank(
        g, TopSimConfig(sample=1e9, enumerate_all=False, **kw),
        sources=srcs, dense=True,
    )
    np.testing.assert_allclose(enum, huge, rtol=1e-6)
    assert np.abs(enum).sum() > 0


def test_topsim_enumerate_splits_below_degree():
    # star center has deg 8; mass 3.5 < 8 still splits over ALL edges in
    # enumerate mode (vs 4 sampled children in budget mode)
    edges = np.array([[0, i] for i in range(1, 9)])
    g = graphtpu.build_graph(edges, n_nodes=9)
    paths = jnp.full((1, 16, 2), -1, jnp.int32).at[0, 0, 0].set(0)
    mass = jnp.zeros((1, 16)).at[0, 0].set(3.5)
    p2, m2, _ = _expand_frontier(
        g, paths, mass, 0, jax.random.key(1), enumerate_all=True
    )
    m2 = np.asarray(m2)
    assert (m2 > 0).sum() == 8
    np.testing.assert_allclose(m2[m2 > 0], 3.5 / 8)
