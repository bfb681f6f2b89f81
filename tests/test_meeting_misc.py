import numpy as np
import jax
import jax.numpy as jnp

import graphtpu
from graphtpu.core.config import SimRankConfig, TopSimConfig
from graphtpu.core.traversal import bfs_distances
from graphtpu.eval.features import max_precision, produce_labels, produce_paths
from graphtpu.io.db import GraphStore
from graphtpu.simrank.exact import exact_simrank
from graphtpu.simrank.meeting import doublesample_similarity, topsim_dev


def test_doublesample_similarity_ring(ring16):
    sim = doublesample_similarity(ring16, TopSimConfig(step=3))
    # symmetric, zero diag, and bipartite parity: odd-distance pairs can
    # meet at odd steps (both walk t steps from each end)...
    np.testing.assert_allclose(sim, sim.T, atol=1e-6)
    assert (np.diag(sim) == 0).all()
    # distance-2 pairs share a midpoint at t=1 -> strictly positive
    assert sim[0, 2] > 0


def test_doublesample_ranking_close_to_exact(small_random):
    from tests.test_simrank import topk_precision

    g = small_random
    exact = np.asarray(exact_simrank(g, SimRankConfig(iterations=3)))
    sim = doublesample_similarity(g, TopSimConfig(step=3))
    p = topk_precision(exact, sim, k=5)
    assert p > 0.35, p  # no first-meet correction -> looser than uniwalk


def test_topsim_dev_two_phase(small_random):
    g = small_random
    vals, idx = topsim_dev(
        g, TopSimConfig(sample=1000.0, step=3, source_tile=16, topk=5),
        single_k=10, key=jax.random.key(0),
    )
    assert vals.shape == (64, 5)
    # verified scores descend
    assert (np.diff(vals, axis=1) <= 1e-6).all()


def test_bfs_distances(ring16):
    d = bfs_distances(ring16, sources=np.array([0, 5]))
    assert d.shape == (2, 16)
    assert d[0, 0] == 0 and d[0, 1] == 1 and d[0, 8] == 8
    assert d[1, 5] == 0 and d[1, 6] == 1


def test_bfs_unreachable():
    g = graphtpu.build_graph(np.array([[0, 1]]), n_nodes=3)
    d = bfs_distances(g, sources=np.array([0]))
    assert d[0, 2] == -1


def test_graph_store_roundtrip(tmp_path):
    store = GraphStore(str(tmp_path / "g.db"))
    edges = np.array([[0, 1], [1, 2]])
    store.insert_edges(edges, np.array([0.5, 2.0]))
    e, w = store.query_edges()
    np.testing.assert_array_equal(e, edges)
    np.testing.assert_allclose(w, [0.5, 2.0])
    store.insert_topk(
        np.array([[2, 1, -1]]), np.array([[0.9, 0.5, 0.0]]), "uniwalk"
    )
    top = store.query_topk(0, 5, "uniwalk")
    assert top == [(2, 0.9), (1, 0.5)]
    store.close()


def test_feature_emitters(tmp_path):
    walks = np.array([[0, 1, 2, -1], [3, -1, -1, -1]])
    n = produce_paths(walks, str(tmp_path / "p.txt"))
    assert n == 2
    assert open(tmp_path / "p.txt").read() == "0 1 2\n3\n"
    gold = {0: [(1, 0.9), (2, 0.8)]}
    single = {0: [(1, 0.5)]}
    double = {0: [(2, 0.4)]}
    labels = dict(((s, d), l) for s, d, l in produce_labels(single, double, gold, topk=2))
    assert labels[(0, 1)] == 1 and labels[(0, 2)] == -1
    assert max_precision({"a": 0.2, "b": 0.7}) == ("b", 0.7)


def test_checkpoint_roundtrip(tmp_path):
    from graphtpu.models.checkpoint import load_state, save_state

    p = str(tmp_path / "ck.npz")
    save_state(p, {"syn0": np.ones((3, 2))}, step=42, meta={"dim": 2})
    arrays, step, meta = load_state(p)
    np.testing.assert_array_equal(arrays["syn0"], np.ones((3, 2)))
    assert step == 42 and meta == {"dim": 2}


def test_weighted_graph_stats():
    from graphtpu.core.stats import evidence, out_weight_sums, out_weight_variance

    edges = np.array([[0, 1], [0, 2], [1, 2]])
    wts = np.array([1.0, 3.0, 2.0], np.float32)
    g = graphtpu.build_graph(edges, wts, n_nodes=3)
    sums = np.asarray(out_weight_sums(g))
    np.testing.assert_allclose(sums, [4.0, 3.0, 5.0])  # undirected mirror
    var = np.asarray(out_weight_variance(g))
    np.testing.assert_allclose(var[0], 1.0)  # weights {1,3}: var=1
    ev = np.asarray(evidence(g, jnp.array([0]), jnp.array([1])))
    np.testing.assert_allclose(ev, [1 - 2.0 ** -2])
