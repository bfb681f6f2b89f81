"""Weighted-graph statistics — the ``DWGraph`` preprocessing analogs.

``structures/DWGraph.java`` precomputes in-edge probability normalisation
(``pre_deal :77-93``), per-node out-weight variance (``deal_varience
:96-112``), and an ``evidence`` factor (``:199``: 1 - 2^{-min(d_in(u),
d_in(v))}, the evidence weighting used by weighted SimRank variants).
Vectorised over CSR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphtpu.core.graph import Graph


def out_weight_sums(g: Graph) -> jax.Array:
    """float32[V]: sum of outgoing weights per node (pre_deal's denom)."""
    w = g.weight if g.weight is not None else jnp.ones_like(g.col, jnp.float32)
    src = jnp.repeat(
        jnp.arange(g.n_nodes), g.deg, total_repeat_length=g.n_edges
    )
    return jnp.zeros(g.n_nodes, jnp.float32).at[src].add(w)


def out_weight_variance(g: Graph) -> jax.Array:
    """float32[V]: variance of each node's outgoing edge weights
    (deal_varience semantics; 0 for degree-0 nodes)."""
    w = g.weight if g.weight is not None else jnp.ones_like(g.col, jnp.float32)
    src = jnp.repeat(
        jnp.arange(g.n_nodes), g.deg, total_repeat_length=g.n_edges
    )
    deg = jnp.maximum(g.deg, 1).astype(jnp.float32)
    s1 = jnp.zeros(g.n_nodes, jnp.float32).at[src].add(w)
    s2 = jnp.zeros(g.n_nodes, jnp.float32).at[src].add(w * w)
    mean = s1 / deg
    var = s2 / deg - mean * mean
    return jnp.where(g.deg > 0, jnp.maximum(var, 0.0), 0.0)


def evidence(g: Graph, u: jax.Array, v: jax.Array) -> jax.Array:
    """Evidence factor 1 - 2^{-min(deg(u), deg(v))} (DWGraph.evidence)."""
    d = jnp.minimum(g.deg[u], g.deg[v]).astype(jnp.float32)
    return 1.0 - jnp.power(2.0, -d)
