"""Double-walk Monte-Carlo SimRank.

Reference (``simrank/DoubleRandomWalk.java:50-91``): pre-sample SAMPLE
walks of STEP hops per node (``paths[v][s][t]`` = node after t+1 hops);
sim(v,w) = (1/SAMPLE^2) * sum over all walk pairs of C^(t+1), where t is
the *first* step at which the two walks coincide (the scan breaks at the
first -1 or first meeting).

TPU form: all walks are one [V, S, STEP] tensor from a single batched
scan.  The pairing loop becomes a blocked computation: for a (T1, T2)
source-pair tile, equality tensors eq_t = (paths_i[:,None,:,None,t] ==
paths_j[None,:,None,:,t]) are combined with a carried "already met" mask —
first-meet weights sum exactly as the reference's break semantics
(walks never revive after -1, so "-1 never equals anything" reproduces the
break).  O(V^2 S^2 STEP) like the reference, but on the VPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphtpu.core.config import DoubleWalkConfig
from graphtpu.core.graph import Graph
from graphtpu.walks.walker import uniform_walks


def sample_double_walk_paths(
    g: Graph, sample: int, step: int, key: jax.Array
) -> jax.Array:
    """int32[V, SAMPLE, STEP]: node after t+1 hops (-1 once dead)."""
    v = g.n_nodes
    starts = jnp.repeat(jnp.arange(v, dtype=jnp.int32), sample)
    walks = uniform_walks(g, starts, step, key)  # [V*S, STEP+1]
    return walks[:, 1:].reshape(v, sample, step)


def doublewalk_simrank(
    g: Graph,
    cfg: DoubleWalkConfig = DoubleWalkConfig(),
    key: Optional[jax.Array] = None,
) -> np.ndarray:
    """Dense [V, V] similarity (diag zeroed), reference estimator."""
    if key is None:
        key = jax.random.key(0)
    v = g.n_nodes
    paths = sample_double_walk_paths(g, cfg.sample, cfg.step, key)
    tile = min(cfg.source_tile, v)
    n_tiles = -(-v // tile)
    pad_v = n_tiles * tile
    if pad_v != v:
        pad = jnp.full((pad_v - v, cfg.sample, cfg.step), -2, jnp.int32)
        paths_p = jnp.concatenate([paths, pad], axis=0)
    else:
        paths_p = paths
    paths_p = paths_p.reshape(n_tiles, tile, cfg.sample, cfg.step)

    @jax.jit
    def pair_block(pi: jax.Array, pj: jax.Array) -> jax.Array:
        # pi: [T, S, L], pj: [T, S, L] -> [T, T] mean first-meet weight
        met = jnp.zeros((tile, tile, cfg.sample, cfg.sample), bool)
        acc = jnp.zeros((tile, tile), jnp.float32)
        for t in range(cfg.step):
            a = pi[:, :, t]  # [T, S]
            b = pj[:, :, t]
            eq = (a[:, None, :, None] == b[None, :, None, :]) & (
                a[:, None, :, None] >= 0
            )
            first = eq & ~met
            acc = acc + (cfg.c ** (t + 1)) * first.sum(
                axis=(2, 3), dtype=jnp.float32
            )
            met = met | eq
        return acc / (cfg.sample * cfg.sample)

    sim = np.zeros((pad_v, pad_v), np.float32)
    for bi in range(n_tiles):
        for bj in range(bi, n_tiles):
            blk = np.asarray(pair_block(paths_p[bi], paths_p[bj]))
            sim[bi * tile : (bi + 1) * tile, bj * tile : (bj + 1) * tile] = blk
            if bj != bi:
                sim[bj * tile : (bj + 1) * tile, bi * tile : (bi + 1) * tile] = blk.T
    sim = sim[:v, :v]
    np.fill_diagonal(sim, 0.0)
    return sim
