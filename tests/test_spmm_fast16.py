"""bf16-iterate throughput mode of the streaming SimRank loop: half the
DMA bytes and HBM footprint, f32 accumulation, one rounding per row per
stage.  Quality bar: values within 1e-2 absolute and >=0.95 top-20
agreement vs the f32 dense gold (far above the dense-bf16 matmul mode's
0.91, because products never round — only stored iterates do)."""

import numpy as np

import jax
import jax.numpy as jnp

from graphtpu.core.config import SimRankConfig
from graphtpu.simrank.exact import exact_simrank, exact_simrank_spmm


def test_fast16_matches_gold_ranking(small_random):
    g = small_random
    gold = np.asarray(exact_simrank(g, SimRankConfig(iterations=4)))
    a16 = np.asarray(
        exact_simrank_spmm(
            g, SimRankConfig(iterations=4), impl="pallas",
            interpret=True, spmv_mode="fast", dtype=jnp.bfloat16,
        ).astype(jnp.float32)
    )
    assert np.abs(a16 - gold).max() < 1e-2
    agree = []
    for r in range(0, g.n_nodes, 5):
        t1 = set(np.argsort(-gold[r])[:10])
        t2 = set(np.argsort(-a16[r])[:10])
        agree.append(len(t1 & t2) / 10)
    assert np.mean(agree) >= 0.95, np.mean(agree)


def test_kahan_rejects_bf16():
    import pytest

    import graphtpu
    from graphtpu.kernels.spmm import build_spmv_stream, spmv_pallas_flat

    rng = np.random.default_rng(0)
    v = 1024
    edges = rng.integers(0, v, size=(3000, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    g = graphtpu.build_graph(edges, n_nodes=v)
    stream = build_spmv_stream(g)
    x = jnp.zeros((v * v,), jnp.bfloat16)
    with pytest.raises(AssertionError):
        spmv_pallas_flat(stream, x, v, mode="kahan", interpret=True)


def test_fast16_seg2_matches_gold_ranking(small_random):
    """Coalesced 2-row-DMA segments compose with bf16 iterates (the
    production throughput combination)."""
    g = small_random
    gold = np.asarray(exact_simrank(g, SimRankConfig(iterations=3)))
    a16 = np.asarray(
        exact_simrank_spmm(
            g, SimRankConfig(iterations=3), impl="pallas",
            interpret=True, spmv_mode="fast", dtype=jnp.bfloat16,
            spmv_seg=2,
        ).astype(jnp.float32)
    )
    assert np.abs(a16 - gold).max() < 1e-2
