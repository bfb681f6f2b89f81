"""EdgeSet (constant-probe membership, kernels/edgeset.py) correctness.

The structure answers the node2vec bias's ``G.has_edge(x, prev)`` probe
(``node2vec/src/node2vec.py:73``); both modes must reproduce exact set
membership on real pairs and (whp) reject non-edges.
"""

import jax
import numpy as np
import pytest

from graphtpu.core.graph import build_graph
from graphtpu.kernels.edgeset import (
    build_edge_set,
    edge_set,
    edge_set_contains,
)


def _random_graph(rng, v=97, e=400):
    edges = rng.integers(0, v, size=(e, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    return build_graph(edges, n_nodes=v), edges


@pytest.mark.parametrize("budget", [64 << 20, 0])  # bitmap, cuckoo
def test_edge_set_membership(budget):
    rng = np.random.default_rng(3)
    g, _ = _random_graph(rng)
    es = build_edge_set(g, bitmap_byte_budget=budget)
    assert es.mode == ("bitmap" if budget else "cuckoo")

    row_ptr = np.asarray(g.row_ptr)
    col = np.asarray(g.col)
    true_set = {
        (u, int(col[e]))
        for u in range(g.n_nodes)
        for e in range(row_ptr[u], row_ptr[u + 1])
    }
    us = rng.integers(0, g.n_nodes, size=4096).astype(np.int32)
    vs = rng.integers(0, g.n_nodes, size=4096).astype(np.int32)
    got = np.asarray(edge_set_contains(es, us, vs))
    want = np.array([(u, v) in true_set for u, v in zip(us, vs)])
    np.testing.assert_array_equal(got, want)

    # every real edge must be found (no false negatives, both modes)
    src = np.repeat(np.arange(g.n_nodes, dtype=np.int32), np.asarray(g.deg))
    hit = np.asarray(edge_set_contains(es, src, col))
    assert hit.all()


def test_edge_set_invalid_ids_and_broadcast():
    rng = np.random.default_rng(5)
    g, _ = _random_graph(rng, v=31, e=90)
    es = build_edge_set(g)
    u = np.array([[-1], [0], [5]], np.int32)
    v = np.array([[0, 3, -1]], np.int32)
    out = np.asarray(edge_set_contains(es, u, v))
    assert out.shape == (3, 3)
    assert not out[0].any() and not out[:, 2].any()


def test_edge_set_cache_returns_same_object():
    rng = np.random.default_rng(7)
    g, _ = _random_graph(rng)
    assert edge_set(g) is edge_set(g)


def test_cuckoo_scales_to_bigger_graph():
    rng = np.random.default_rng(11)
    g, _ = _random_graph(rng, v=5000, e=60000)
    es = build_edge_set(g, bitmap_byte_budget=0)
    row_ptr = np.asarray(g.row_ptr)
    col = np.asarray(g.col)
    src = np.repeat(np.arange(g.n_nodes, dtype=np.int32), np.asarray(g.deg))
    assert np.asarray(edge_set_contains(es, src, col)).all()
    # random non-edges: false-positive rate must be ~0 (allow none in 20k)
    us = rng.integers(0, g.n_nodes, size=20000).astype(np.int32)
    vs = rng.integers(0, g.n_nodes, size=20000).astype(np.int32)
    got = np.asarray(edge_set_contains(es, us, vs))
    true = set(zip(src.tolist(), col.tolist()))
    want = np.array([(u, v) in true for u, v in zip(us.tolist(), vs.tolist())])
    np.testing.assert_array_equal(got, want)
