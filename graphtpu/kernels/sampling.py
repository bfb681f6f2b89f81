"""Vectorised neighbour sampling over CSR — the walk-engine inner ops.

Replaces the reference's per-call scalar samplers:
  * uniform  — ``structures/Graph.randNeighbor`` (``Graph.java:69-73``,
    returns -1 at dead ends)
  * weighted — ``structures/WGraph.randNeighborByWeight`` builds a cumulative
    distribution then binary-searches (``WGraph.java:89-105``); we precompute
    the per-row cumulative once and binary-search in-kernel
  * membership — ``G.has_edge`` in the node2vec bias rule
    (``node2vec/src/node2vec.py:73``): vectorised bisection over sorted rows

Everything is batch-first: ``cur`` is an int32[B] frontier; one XLA gather
per step feeds the whole batch.  No data-dependent shapes: dead walkers carry
``cur == -1`` and keep sampling masked garbage that callers ignore.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from graphtpu.core.graph import Graph


def _bisect_steps(max_degree: int) -> int:
    return max(1, math.ceil(math.log2(max(2, max_degree))) + 1)


def uniform_neighbor(g: Graph, cur: jax.Array, key: jax.Array) -> jax.Array:
    """One uniform neighbour per walker; -1 for dead/invalid walkers."""
    safe = jnp.maximum(cur, 0)
    deg = g.deg[safe]
    lo = g.row_ptr[safe]
    u = jax.random.uniform(key, cur.shape)
    idx = jnp.minimum((u * deg).astype(jnp.int32), jnp.maximum(deg - 1, 0))
    nxt = g.col[lo + idx]
    alive = (cur >= 0) & (deg > 0)
    return jnp.where(alive, nxt, -1)


def row_cumulative_weights(g: Graph) -> jax.Array:
    """float32[E]: within-row cumulative weights (unnormalised).

    Precomputed once per graph; the in-kernel weighted draw is then a
    bisection, which is the reference's ``LxcArrays.insertPoint`` binary
    search (``lxctools/LxcArrays.java:53``) done for a whole batch at once.
    """
    w = g.weight if g.weight is not None else jnp.ones_like(g.col, jnp.float32)
    csum = jnp.cumsum(w)
    row_base = jnp.concatenate([jnp.zeros(1, csum.dtype), csum])[g.row_ptr[:-1]]
    starts = jnp.repeat(
        row_base, g.deg, total_repeat_length=g.n_edges
    )
    return csum - starts


def weighted_neighbor(
    g: Graph, cumw: jax.Array, cur: jax.Array, key: jax.Array
) -> jax.Array:
    """One weight-proportional neighbour per walker via row bisection."""
    safe = jnp.maximum(cur, 0)
    deg = g.deg[safe]
    lo = g.row_ptr[safe].astype(jnp.int32)
    total_idx = lo + jnp.maximum(deg - 1, 0)
    total = cumw[total_idx]
    u = jax.random.uniform(key, cur.shape) * total
    # find first position in [lo, lo+deg) with cumw >= u
    lo_i = jnp.zeros_like(deg)
    hi_i = deg  # exclusive
    for _ in range(_bisect_steps(g.max_degree)):
        mid = (lo_i + hi_i) // 2
        val = cumw[lo + jnp.minimum(mid, jnp.maximum(deg - 1, 0))]
        go_right = val < u
        lo_i = jnp.where(go_right, mid + 1, lo_i)
        hi_i = jnp.where(go_right, hi_i, mid)
    idx = jnp.minimum(lo_i, jnp.maximum(deg - 1, 0))
    nxt = g.col[lo + idx]
    alive = (cur >= 0) & (deg > 0)
    return jnp.where(alive, nxt, -1)


def edge_exists(g: Graph, u: jax.Array, v: jax.Array) -> jax.Array:
    """bool per pair: is v a neighbour of u?  Bisection over u's sorted row.

    Shapes broadcast: u and v may be [B] or [B, K].
    """
    u, v = jnp.broadcast_arrays(u, v)
    safe = jnp.maximum(u, 0)
    deg = g.deg[safe]
    lo = g.row_ptr[safe].astype(jnp.int32)
    lo_i = jnp.zeros_like(deg)
    hi_i = deg
    for _ in range(_bisect_steps(g.max_degree)):
        mid = (lo_i + hi_i) // 2
        val = g.col[lo + jnp.minimum(mid, jnp.maximum(deg - 1, 0))]
        go_right = val < v
        lo_i = jnp.where(go_right, mid + 1, lo_i)
        hi_i = jnp.where(go_right, hi_i, mid)
    found_idx = jnp.minimum(lo_i, jnp.maximum(deg - 1, 0))
    hit = (g.col[lo + found_idx] == v) & (lo_i < deg) & (deg > 0) & (u >= 0)
    return hit


def sample_from_cdf(cdf: jax.Array, key: jax.Array, shape) -> jax.Array:
    """Draw int32 indices ~ categorical given an (unnormalised) 1-D cdf.

    The negative-sampling table draw (gensim's unigram^0.75 table) as a
    searchsorted over a [V]-sized cumulative array.
    """
    total = cdf[-1]
    u = jax.random.uniform(key, shape) * total
    return jnp.searchsorted(cdf, u, side="right").astype(jnp.int32)
