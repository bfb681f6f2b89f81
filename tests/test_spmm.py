"""Gather-reduction-tree SpMM (kernels/spmm.py) parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphtpu
from graphtpu.core.config import SimRankConfig
from graphtpu.kernels.spmm import (
    build_reduction_tree,
    spmm_oracle,
    tree_spmm,
)
from graphtpu.simrank.exact import exact_simrank, exact_simrank_spmm


def _graph(v=67, e=600, seed=0, weighted=False, hub=True):
    rng = np.random.default_rng(seed)
    edges = rng.integers(0, v, size=(e, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    if hub:  # force a node whose degree exceeds width**2 (3 tree levels)
        hub_edges = np.stack(
            [np.zeros(v - 2, np.int64), np.arange(1, v - 1)], 1
        )
        edges = np.concatenate([edges, hub_edges])
    # node v-1 stays isolated (zero row)
    edges = edges[(edges[:, 0] != v - 1) & (edges[:, 1] != v - 1)]
    wts = rng.random(len(edges)).astype(np.float32) + 0.1 if weighted else None
    return graphtpu.build_graph(edges, weights=wts, n_nodes=v)


@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("width", [4, 8])
def test_tree_spmm_matches_oracle(weighted, width):
    g = _graph(weighted=weighted)
    tree = build_reduction_tree(g, width=width, weighted=weighted)
    assert len(tree.levels) >= 3  # hub degree > width**2
    rng = np.random.default_rng(1)
    x = rng.random((g.n_nodes, 33)).astype(np.float32)
    got = np.asarray(jax.jit(lambda x: tree_spmm(tree, x))(jnp.asarray(x)))
    want = spmm_oracle(g, x, weighted=weighted)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # isolated node -> zero output row
    assert np.all(got[g.n_nodes - 1] == 0)


def test_tree_spmm_column_blocking():
    g = _graph(hub=False)
    tree = build_reduction_tree(g, width=8)
    rng = np.random.default_rng(2)
    x = rng.random((g.n_nodes, 70)).astype(np.float32)  # 70 = 2*32 + 6 tail
    got = np.asarray(
        jax.jit(lambda x: tree_spmm(tree, x, col_block=32))(jnp.asarray(x))
    )
    want = spmm_oracle(g, x)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_gather_rows_sum_interpret():
    """The Pallas ring-DMA kernel must equal the XLA formulation
    (interpreter mode on CPU; the real-TPU run is covered by
    tools/bench_spmm.py)."""
    from graphtpu.kernels.spmm import (
        gather_rows_sum_pallas,
        gather_rows_sum_xla,
    )

    rng = np.random.default_rng(3)
    m, w, n, c = 256, 8, 50, 1024
    slots = jnp.asarray(rng.integers(0, n, (m, w)).astype(np.int32))
    wts = jnp.asarray(rng.random((m, w)).astype(np.float32))
    table = jnp.asarray(rng.random((n, c)).astype(np.float32))
    got = np.asarray(
        gather_rows_sum_pallas(slots, wts, table, interpret=True)
    )
    want = np.asarray(gather_rows_sum_xla(slots, wts, table))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("weighted", [False, True])
def test_spmv_stream_plan_matches_oracle(weighted):
    from graphtpu.kernels.spmm import build_spmv_stream, spmv_stream_xla

    g = _graph(weighted=weighted)
    stream = build_spmv_stream(g, weighted=weighted, block_items=64)
    rng = np.random.default_rng(4)
    x = rng.random((g.n_nodes, 33)).astype(np.float32)
    got = np.asarray(spmv_stream_xla(stream, jnp.asarray(x)))
    want = spmm_oracle(g, x, weighted=weighted)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.all(got[g.n_nodes - 1] == 0)  # isolated node -> zero row


@pytest.mark.parametrize("mode", ["kahan", "fast"])
def test_spmv_pallas_streaming_interpret(mode):
    """The streaming kernels (ring DMAs + run accumulation + row flush
    DMAs) must match the oracle, including rows spanning item blocks,
    isolated rows, and the final-flush path."""
    from graphtpu.kernels.spmm import build_spmv_stream, spmv_pallas

    g = _graph(v=40, e=300, hub=True)  # hub row spans many 16-item blocks
    stream = build_spmv_stream(g, block_items=16)
    rng = np.random.default_rng(5)
    x = rng.random((g.n_nodes, 1024)).astype(np.float32)
    got = np.asarray(
        spmv_pallas(stream, jnp.asarray(x), interpret=True, mode=mode)
    )
    want = spmm_oracle(g, x)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.all(got[g.n_nodes - 1] == 0)


@pytest.mark.parametrize("mode", ["kahan", "fast"])
def test_spmv_pallas_weighted_interpret(mode):
    from graphtpu.kernels.spmm import build_spmv_stream, spmv_pallas

    g = _graph(v=36, e=200, weighted=True)
    stream = build_spmv_stream(g, weighted=True, block_items=16)
    assert not stream.uniform
    rng = np.random.default_rng(7)
    x = rng.random((g.n_nodes, 1024)).astype(np.float32)
    got = np.asarray(
        spmv_pallas(stream, jnp.asarray(x), interpret=True, mode=mode)
    )
    want = spmm_oracle(g, x, weighted=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("weighted", [False, True])
def test_exact_simrank_spmm_matches_dense(small_random, weighted):
    g = small_random
    cfg = SimRankConfig(iterations=4)
    dense = np.asarray(exact_simrank(g, cfg, weighted=weighted))
    sparse = np.asarray(
        exact_simrank_spmm(g, cfg, weighted=weighted, col_block=48)
    )
    np.testing.assert_allclose(sparse, dense, atol=2e-5)


@pytest.mark.parametrize("mode", ["kahan", "fast"])
def test_exact_simrank_spmm_flat_staged_pallas(small_random, mode):
    """The TPU production path — flat iterates, panel transpose, flat
    diag pinning — run under pallas interpret mode so its staging logic
    (not just the kernel) is exercised off-hardware."""
    g = small_random
    cfg = SimRankConfig(iterations=3)
    dense = np.asarray(exact_simrank(g, cfg))
    staged = np.asarray(
        exact_simrank_spmm(g, cfg, impl="pallas", spmv_mode=mode,
                           interpret=True)
    )
    np.testing.assert_allclose(staged, dense, atol=2e-5)


# ------------------------------------------------------- coalesced segments


@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("k", [2, 4])
def test_spmv_segments_plan_matches_oracle(weighted, k):
    """Coalesced k-row segment streams (build_spmv_segments) compute the
    same product as per-item streams — zero-weight padding rows and the
    table-edge clamp included."""
    from graphtpu.kernels.spmm import build_spmv_segments, spmv_stream_xla

    g = _graph(weighted=weighted)
    seg = build_spmv_segments(g, weighted=weighted, block_items=64, k=k)
    assert seg.seg_k == k
    rng = np.random.default_rng(4)
    x = rng.random((g.n_nodes, 33)).astype(np.float32)
    got = np.asarray(spmv_stream_xla(seg, jnp.asarray(x)))
    want = spmm_oracle(g, x, weighted=weighted)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.all(got[g.n_nodes - 1] == 0)  # isolated node -> zero row


def test_spmv_segments_fewer_dmas_after_relabel():
    """BFS relabeling raises the adjacent-slot fraction, and the segment
    plan converts that into fewer DMA items (the whole point)."""
    from graphtpu.core.reorder import bfs_order, relabel_graph
    from graphtpu.kernels.spmm import build_spmv_segments, build_spmv_stream

    # a 1-D lattice-ish graph scrambled by random labels: near-perfect
    # locality exists but only after relabeling recovers it
    v = 400
    rng = np.random.default_rng(11)
    base = np.stack([np.arange(v - 1), np.arange(1, v)], 1)
    extra = np.stack([np.arange(v - 2), np.arange(2, v)], 1)
    perm = rng.permutation(v)
    edges = perm[np.concatenate([base, extra])]
    g = graphtpu.build_graph(edges, n_nodes=v)
    g2, _ = relabel_graph(g, bfs_order(g))
    items = build_spmv_stream(g2, block_items=8).n_items
    segs = build_spmv_segments(g2, block_items=8, k=2).n_items
    assert segs < 0.65 * items, (segs, items)


@pytest.mark.parametrize("mode", ["kahan", "fast"])
def test_spmv_pallas_segments_interpret(mode):
    from graphtpu.kernels.spmm import build_spmv_segments, spmv_pallas

    g = _graph(v=40, e=300, hub=True)
    seg = build_spmv_segments(g, block_items=16, k=2)
    rng = np.random.default_rng(5)
    x = rng.random((g.n_nodes, 1024)).astype(np.float32)
    got = np.asarray(
        spmv_pallas(seg, jnp.asarray(x), interpret=True, mode=mode)
    )
    want = spmm_oracle(g, x)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.all(got[g.n_nodes - 1] == 0)


@pytest.mark.parametrize("mode", ["kahan", "fast"])
def test_exact_simrank_spmm_segments_staged(small_random, mode, monkeypatch):
    """The full staged pipeline on coalesced streams (GRAPHTPU_SPMV_SEG),
    table_scale diag-pin fusion included."""
    monkeypatch.setenv("GRAPHTPU_SPMV_SEG", "2")
    g = small_random
    cfg = SimRankConfig(iterations=3)
    dense = np.asarray(exact_simrank(g, cfg))
    staged = np.asarray(
        exact_simrank_spmm(g, cfg, impl="pallas", spmv_mode=mode,
                           interpret=True)
    )
    np.testing.assert_allclose(staged, dense, atol=2e-5)
