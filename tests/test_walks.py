"""Walk-engine statistics tests.

The reference has no unit tests; per SURVEY.md §4 we define walk parity
*statistically*: empirical transition frequencies must match the reference
bias rule's exact distribution (total-variation / chi-square bounds), since
per-sample equality is meaningless across RNGs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphtpu
from graphtpu.kernels.sampling import (
    edge_exists,
    row_cumulative_weights,
    weighted_neighbor,
    uniform_neighbor,
)
from graphtpu.walks import (
    uniform_walks,
    simulate_walks,
    node2vec_walks,
    node2vec_transition_probs,
    alias_setup,
    alias_sample,
)
from graphtpu.walks.walker import walks_to_corpus


def test_uniform_walks_shape_and_validity(small_random):
    g = small_random
    starts = jnp.arange(g.n_nodes, dtype=jnp.int32)
    walks = uniform_walks(g, starts, 10, jax.random.key(0))
    walks = np.asarray(walks)
    assert walks.shape == (g.n_nodes, 11)
    # every transition is a real edge
    rp, col = np.asarray(g.row_ptr), np.asarray(g.col)
    for b in range(g.n_nodes):
        for t in range(10):
            u, v = walks[b, t], walks[b, t + 1]
            if v < 0:
                continue
            assert v in col[rp[u] : rp[u + 1]]


def test_dead_end_propagates_minus_one():
    g = graphtpu.build_graph(np.array([[0, 1]]), n_nodes=3, directed=True).out
    walks = np.asarray(
        uniform_walks(g, jnp.array([0, 2], dtype=jnp.int32), 4, jax.random.key(1))
    )
    assert list(walks[0]) == [0, 1, -1, -1, -1]  # 1 is a sink
    assert list(walks[1]) == [2, -1, -1, -1, -1]  # isolated start


def test_edge_exists_matches_adjacency(small_random):
    g = small_random
    rng = np.random.default_rng(0)
    u = rng.integers(0, g.n_nodes, 200)
    v = rng.integers(0, g.n_nodes, 200)
    got = np.asarray(edge_exists(g, jnp.asarray(u), jnp.asarray(v)))
    rp, col = np.asarray(g.row_ptr), np.asarray(g.col)
    want = np.array([vv in col[rp[uu] : rp[uu + 1]] for uu, vv in zip(u, v)])
    np.testing.assert_array_equal(got, want)


def test_uniform_neighbor_distribution(ring16):
    g = ring16
    cur = jnp.zeros(4000, jnp.int32)
    nxt = np.asarray(uniform_neighbor(g, cur, jax.random.key(2)))
    # ring node 0 has neighbours 1 and 15, each with probability 1/2
    counts = np.bincount(nxt, minlength=16)
    assert counts[1] + counts[15] == 4000
    assert abs(counts[1] / 4000 - 0.5) < 0.05


def test_weighted_neighbor_distribution():
    edges = np.array([[0, 1], [0, 2], [0, 3]])
    wts = np.array([1.0, 2.0, 5.0])
    g = graphtpu.build_graph(edges, wts, n_nodes=4)
    cumw = row_cumulative_weights(g)
    nxt = np.asarray(
        weighted_neighbor(g, cumw, jnp.zeros(8000, jnp.int32), jax.random.key(3))
    )
    freq = np.bincount(nxt, minlength=4)[1:4] / 8000
    np.testing.assert_allclose(freq, [1 / 8, 2 / 8, 5 / 8], atol=0.03)


@pytest.mark.parametrize("mode", ["rejection", "exact"])
@pytest.mark.parametrize("pq", [(0.25, 0.25), (4.0, 0.5), (1.0, 2.0)])
def test_second_order_transition_statistics(small_random, mode, pq):
    """Empirical next-hop distribution == reference get_alias_edge rule."""
    p, q = pq
    g = small_random
    # choose a (prev, cur) edge with a branching cur
    rp, col = np.asarray(g.row_ptr), np.asarray(g.col)
    deg = np.asarray(g.deg)
    prev = int(np.argmax(deg))
    cur = int(col[rp[prev]])
    n = 6000
    # drive just the second-order step via 2-step walks pinned at (prev,cur):
    # walk starts at prev; force first hop to cur by intercepting the walk
    # tensor — instead call the step through node2vec_walks on a path graph
    # is awkward, so use the internal step directly.
    from graphtpu.walks.node2vec import (
        _second_order_step_exact,
        _second_order_step_rejection,
    )
    from graphtpu.core.graph import padded_neighbors
    from graphtpu.kernels.edgeset import edge_set

    es = edge_set(g)
    prev_a = jnp.full((n,), prev, jnp.int32)
    cur_a = jnp.full((n,), cur, jnp.int32)
    if mode == "exact":
        nbrs, nwts = padded_neighbors(g)
        nxt = _second_order_step_exact(
            g, es, nbrs, nwts, prev_a, cur_a, jax.random.key(7), 1 / p, 1 / q
        )
    else:
        nxt = _second_order_step_rejection(
            g, None, es, prev_a, cur_a, jax.random.key(7), 1 / p, 1 / q, 24,
            False,
        )
    nxt = np.asarray(nxt)
    assert (nxt >= 0).all()
    emp = np.bincount(nxt, minlength=g.n_nodes) / n
    want = node2vec_transition_probs(g, prev, cur, p, q)
    tv = 0.5 * np.abs(emp - want).sum()
    assert tv < 0.06, f"total variation {tv} too high for mode={mode}, p={p}, q={q}"


def test_node2vec_walks_edges_valid(small_random):
    g = small_random
    starts = jnp.arange(g.n_nodes, dtype=jnp.int32)
    walks = np.asarray(
        node2vec_walks(g, starts, 8, p=0.25, q=0.25, key=jax.random.key(0))
    )
    assert walks.shape == (g.n_nodes, 9)
    rp, col = np.asarray(g.row_ptr), np.asarray(g.col)
    for b in range(0, g.n_nodes, 7):
        for t in range(8):
            u, v = walks[b, t], walks[b, t + 1]
            if v < 0:
                continue
            assert v in col[rp[u] : rp[u + 1]]


def test_simulate_walks_reference_budget(karate):
    """10 walks x walk_length 80 nodes (node2vec/src/main.py:35-41)."""
    walks = simulate_walks(karate, num_walks=2, walk_length=10, key=jax.random.key(0))
    n_active = int((np.asarray(karate.deg) > 0).sum())
    assert walks.shape == (2 * n_active, 10)
    corpus = walks_to_corpus(walks)
    assert all(len(c) == 10 for c in corpus)  # karate has no dead ends


def test_alias_method_statistics():
    probs = [0.1, 0.2, 0.3, 0.4]
    J, q = alias_setup(probs)
    rng = np.random.default_rng(0)
    draws = alias_sample(J, q, rng, 20000)
    freq = np.bincount(draws, minlength=4) / 20000
    np.testing.assert_allclose(freq, probs, atol=0.02)


def test_directed_walks_follow_out_edges():
    import graphtpu

    dg = graphtpu.build_graph(
        np.array([[0, 1], [1, 2], [2, 0], [2, 3]]), n_nodes=4, directed=True
    )
    walks = np.asarray(
        uniform_walks(dg.out, jnp.zeros(50, jnp.int32), 5, jax.random.key(0))
    )
    rp, col = np.asarray(dg.out.row_ptr), np.asarray(dg.out.col)
    for row in walks:
        for t in range(5):
            u, v = row[t], row[t + 1]
            if v < 0:
                continue
            assert v in col[rp[u]: rp[u + 1]]
    # node 3 is a sink: walks reaching it must stop
    for row in walks:
        hit = np.where(row == 3)[0]
        if len(hit) and hit[0] < 5:
            assert (row[hit[0] + 1:] == -1).all()


def test_walks_deterministic_given_key(small_random):
    """Pure-functional kernels + threefry keys: identical keys give
    identical walks (SURVEY §5: determinism test replaces race detection;
    the reference shared a java.util.Random across threads)."""
    g = small_random
    a = np.asarray(simulate_walks(g, 2, 12, jax.random.key(9), p=0.5, q=2.0))
    b = np.asarray(simulate_walks(g, 2, 12, jax.random.key(9), p=0.5, q=2.0))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(simulate_walks(g, 2, 12, jax.random.key(10), p=0.5, q=2.0))
    assert (a != c).any()


def test_uniform_walks_sort_gather_valid_and_statistical(small_random):
    """sort_gather walks are valid-edge walks with the same transition
    statistics (sorting only permutes which independent draw a walker
    consumes)."""
    import jax
    import jax.numpy as jnp
    from graphtpu.walks.walker import uniform_walks

    g = small_random
    starts = jnp.asarray(np.arange(64, dtype=np.int32))
    w = np.asarray(uniform_walks(g, starts, 8, jax.random.key(3),
                                 sort_gather=True))
    rp, col = np.asarray(g.row_ptr), np.asarray(g.col)
    for b in range(64):
        for t in range(8):
            u, v = w[b, t], w[b, t + 1]
            if v < 0:
                continue
            assert v in col[rp[u]: rp[u + 1]], (b, t, u, v)
    # statistical check: per-start next-hop frequencies match degree-
    # uniform draws (chi^2-ish bound over many walks from one node)
    starts2 = jnp.zeros((2000,), jnp.int32)
    w2 = np.asarray(uniform_walks(g, starts2, 1, jax.random.key(5),
                                  sort_gather=True))
    nbrs = col[rp[0]: rp[1]]
    counts = np.array([(w2[:, 1] == n).sum() for n in np.unique(nbrs)])
    expected = 2000 / len(np.unique(nbrs))
    assert np.all(np.abs(counts - expected) < 6 * np.sqrt(expected) + 10)


def test_uniform_walks_sort_gather_weighted(small_random):
    import jax
    import jax.numpy as jnp
    from graphtpu.walks.walker import uniform_walks

    rng = np.random.default_rng(2)
    rp = np.asarray(small_random.row_ptr)
    g = graphtpu.build_graph(
        np.array([[u, v] for u in range(64)
                  for v in np.asarray(small_random.col)[rp[u]:rp[u+1]]]),
        weights=None, n_nodes=64,
    )
    # attach random weights
    import dataclasses
    g = dataclasses.replace(
        g, weight=jnp.asarray(
            rng.random(int(np.asarray(g.n_edges))).astype(np.float32) + 0.1
        )
    )
    w = np.asarray(uniform_walks(
        g, jnp.arange(32, dtype=jnp.int32), 5, jax.random.key(1),
        weighted=True, sort_gather=True,
    ))
    rp2, col2 = np.asarray(g.row_ptr), np.asarray(g.col)
    for b in range(32):
        for t in range(5):
            u, v = w[b, t], w[b, t + 1]
            if v < 0:
                continue
            assert v in col2[rp2[u]: rp2[u + 1]], (b, t, u, v)


def test_node2vec_walks_sort_gather_valid(small_random):
    import jax
    import jax.numpy as jnp
    from graphtpu.walks.node2vec import node2vec_walks

    g = small_random
    w = np.asarray(node2vec_walks(
        g, jnp.arange(48, dtype=jnp.int32), 6, p=0.5, q=2.0,
        key=jax.random.key(9), sort_gather=True,
    ))
    rp, col = np.asarray(g.row_ptr), np.asarray(g.col)
    for b in range(48):
        for t in range(6):
            u, v = w[b, t], w[b, t + 1]
            if v < 0:
                continue
            assert v in col[rp[u]: rp[u + 1]], (b, t, u, v)
