import os

import numpy as np
import pytest

import graphtpu
from graphtpu.core.graph import (
    build_graph,
    dense_adjacency,
    column_normalized,
    padded_neighbors,
)
from graphtpu.io.edgelist import read_edgelist, write_edgelist
from graphtpu.io.simfile import read_sim_file, write_topk_files, read_topk_ids
from graphtpu.io.embfile import read_emb, write_emb


def test_build_undirected_mirrors_edges():
    g = build_graph(np.array([[0, 1], [1, 2]]), n_nodes=3)
    assert g.n_nodes == 3
    assert g.n_edges == 4  # each undirected edge stored twice
    assert list(g.neighbors(1)) == [0, 2]
    assert g.degree(0) == 1 and g.degree(1) == 2
    assert g.max_degree == 2


def test_neighbors_sorted_and_dedup():
    g = build_graph(np.array([[0, 2], [0, 1], [0, 2]]), n_nodes=3)
    assert list(g.neighbors(0)) == [1, 2]
    assert g.degree(0) == 2
    g2 = build_graph(np.array([[0, 2], [0, 1], [0, 2]]), n_nodes=3, dedup=False)
    assert g2.degree(0) == 3  # Java-style multi-edge retention


def test_directed_in_out():
    dg = build_graph(np.array([[0, 1], [2, 1]]), n_nodes=3, directed=True)
    assert list(dg.out.neighbors(0)) == [1]
    assert list(dg.in_.neighbors(1)) == [0, 2]
    assert dg.out.degree(1) == 0


def test_dense_and_normalized_adjacency():
    g = build_graph(np.array([[0, 1], [1, 2]]), n_nodes=3)
    a = np.asarray(dense_adjacency(g))
    assert a[0, 1] == 1 and a[1, 0] == 1 and a[1, 2] == 1
    w = np.asarray(column_normalized(dense_adjacency(g)))
    np.testing.assert_allclose(w.sum(0), [1, 1, 1], atol=1e-6)
    # column v divides by deg(v)
    np.testing.assert_allclose(w[:, 1], [0.5, 0, 0.5], atol=1e-6)


def test_padded_neighbors():
    g = build_graph(np.array([[0, 1], [1, 2], [1, 3]]), n_nodes=4)
    nbrs, _ = padded_neighbors(g)
    nbrs = np.asarray(nbrs)
    assert nbrs.shape == (4, 3)
    assert list(nbrs[1]) == [0, 2, 3]
    assert nbrs[0, 1] == -1  # padding


def test_edgelist_roundtrip(tmp_path):
    path = str(tmp_path / "g.txt")
    edges = np.array([[0, 1], [1, 2], [5, 3]])
    write_edgelist(path, edges, weights=np.array([1.5, 2.0, 0.25]))
    e2, w2 = read_edgelist(path)
    np.testing.assert_array_equal(e2, edges)
    np.testing.assert_allclose(w2, [1.5, 2.0, 0.25])


def test_edgelist_comma_delimited(tmp_path):
    path = str(tmp_path / "g.csv")
    with open(path, "w") as f:
        f.write("0,1\n2,3\n")
    e, w = read_edgelist(path)
    np.testing.assert_array_equal(e, [[0, 1], [2, 3]])
    assert w is None


def test_simfile_roundtrip(tmp_path):
    out = str(tmp_path / "topk.txt")
    idx = np.array([[2, 1, -1], [0, 3, 4]])
    sc = np.array([[0.9, 0.5, 0.0], [0.8, 0.25, 0.125]])
    p_ids, p_sim = write_topk_files(out, idx, sc)
    sims = read_sim_file(p_sim)
    assert sims[0] == [(2, 0.9), (1, 0.5)]
    assert sims[1][0] == (0, 0.8)
    ids = read_topk_ids(p_ids)
    assert ids[0] == [2, 1]


def test_simfile_reads_reference_space_format(tmp_path):
    # older reference files use spaces (IsoMap_LE/data/*.sim.txt)
    path = str(tmp_path / "old.sim.txt")
    with open(path, "w") as f:
        f.write("0 329:0.05161244 317:0.05020227\n1 280:0.04740160\n")
    sims = read_sim_file(path)
    assert sims[0][0] == (329, 0.05161244)
    assert sims[1] == [(280, 0.0474016)]


def test_emb_roundtrip(tmp_path):
    path = str(tmp_path / "x.emb")
    emb = np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32)
    write_emb(path, emb, labels=[str(i + 1) for i in range(5)])
    labels, vecs = read_emb(path)
    assert labels == ["1", "2", "3", "4", "5"]
    np.testing.assert_allclose(vecs, emb, atol=1e-6)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/node2vec/emb/karate.emb"),
    reason="reference data not mounted",
)
def test_reads_reference_karate_emb():
    labels, vecs = read_emb("/root/reference/node2vec/emb/karate.emb")
    assert vecs.shape == (34, 128)
    assert "34" in labels


def test_karate_graph(karate):
    assert karate.n_nodes == 35
    assert karate.degree(34) == 0 or karate.degree(34) >= 0  # node 0 unused; ids 1..34


def test_load_graph_cached_roundtrip(tmp_path):
    import graphtpu
    import numpy as np

    p = str(tmp_path / "g.txt")
    rng = np.random.default_rng(0)
    edges = rng.integers(0, 50, size=(120, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    with open(p, "w") as f:
        for a, b in edges:
            f.write(f"{a} {b}\n")
    g1 = graphtpu.load_graph_cached(p, n_nodes=50)
    import os

    assert os.path.exists(p + ".csr.npz")
    g2 = graphtpu.load_graph_cached(p, n_nodes=50)  # cache hit
    np.testing.assert_array_equal(np.asarray(g1.col), np.asarray(g2.col))
    np.testing.assert_array_equal(
        np.asarray(g1.row_ptr), np.asarray(g2.row_ptr)
    )
    assert g1.max_degree == g2.max_degree
