"""Pallas tiled flat-transpose parity (kernels/transpose.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphtpu.kernels.transpose import transpose_flat_pallas


@pytest.mark.parametrize("v,tb", [(2048, None), (2048, 1024), (3072, 1024)])
def test_transpose_flat_pallas_parity(v, tb):
    rng = np.random.default_rng(v)
    x = rng.normal(size=(v, v)).astype(np.float32)
    xf = jnp.asarray(
        np.concatenate([x.reshape(-1), np.zeros(v, np.float32)])
    )
    out = np.asarray(
        transpose_flat_pallas(xf, v, tb=tb, interpret=True)
    )
    np.testing.assert_array_equal(out[: v * v].reshape(v, v), x.T)


def test_transpose_consumable_by_mul():
    """The padded ((v+1)*v,) output feeds the streaming mul directly."""
    import graphtpu
    from graphtpu.kernels.spmm import build_spmv_stream, spmv_pallas_flat

    v = 1024
    rng = np.random.default_rng(0)
    edges = rng.integers(0, v, size=(4000, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    g = graphtpu.build_graph(edges, n_nodes=v)
    stream = build_spmv_stream(g)
    x = rng.normal(size=(v, v)).astype(np.float32)
    xf = jnp.asarray(np.concatenate([x.reshape(-1), np.zeros(v, np.float32)]))
    xt = transpose_flat_pallas(xf, v, interpret=True)
    got = np.asarray(
        spmv_pallas_flat(stream, xt, v, interpret=True)
    )[: v * v].reshape(v, v)
    # reference: P @ x.T with row-stochastic P
    rp, col = np.asarray(g.row_ptr), np.asarray(g.col)
    ref = np.zeros((v, v), np.float32)
    deg = np.diff(rp)
    for i in range(v):
        if deg[i]:
            ref[i] = x.T[col[rp[i] : rp[i + 1]]].sum(0) / deg[i]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
