"""Graph traversal utilities — BFS hop distances.

``utils/BFSDist.java:18-40`` computes BFS hop distances from the first
``maxStat`` sources into a byte matrix.  TPU form: frontier propagation as
boolean matrix-vector products over the padded adjacency, all sources at
once (one [S, V] frontier per level).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphtpu.core.graph import Graph, dense_adjacency


def bfs_distances(
    g: Graph,
    sources: Optional[np.ndarray] = None,
    max_dist: int = 127,
    unreachable: int = -1,
) -> np.ndarray:
    """int8/int32 [S, V] hop distances (unreachable -> ``unreachable``)."""
    if sources is None:
        sources = np.arange(min(g.n_nodes, 100), dtype=np.int32)
    sources = np.asarray(sources, np.int32)
    a = dense_adjacency(g) > 0  # [V, V] bool

    @jax.jit
    def run(src):
        s = src.shape[0]
        v = a.shape[0]
        dist = jnp.full((s, v), jnp.iinfo(jnp.int32).max, jnp.int32)
        frontier = jnp.zeros((s, v), bool).at[jnp.arange(s), src].set(True)
        dist = jnp.where(frontier, 0, dist)

        af = a.astype(jnp.float32)

        def body(carry):
            d, frontier, dist = carry
            reach = (frontier.astype(jnp.float32) @ af) > 0
            nxt = reach & (dist == jnp.iinfo(jnp.int32).max)
            dist = jnp.where(nxt, d + 1, dist)
            return d + 1, nxt, dist

        def cond(carry):
            d, frontier, _ = carry
            return (d < max_dist) & frontier.any()

        _, _, dist = jax.lax.while_loop(
            cond, body, (jnp.int32(0), frontier, dist)
        )
        return dist

    dist = np.array(run(jnp.asarray(sources)))  # writable copy
    dist[dist == np.iinfo(np.int32).max] = unreachable
    return dist
