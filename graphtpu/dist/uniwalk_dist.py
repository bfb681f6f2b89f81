"""Distributed UniWalk SimRank — the ``giraph/SingleWalkVertex`` analog.

Reference flow (``giraph/SingleWalkVertex.java:66-89``): every vertex emits
SAMPLE walker messages; each superstep walkers hop via vertex messages,
and at even steps a similarity-increment message is sent back to the
source, accumulated in a bounded map.  Batched-window variants flush
per-window results (``BatchSingleWalkVertex.java:108-133``).

TPU mapping: sources are sharded over the mesh ('data' axis = the Giraph
worker partition); walkers route between node owners with the
:mod:`graphtpu.dist.frontier` all_to_all exchange (one jitted superstep
per hop); each home shard then computes its sources' first-meet increments
locally and reduces straight to top-k — the flush.  Combine with
:func:`graphtpu.dist.windows.windowed_topk_sweep` for the batch-window +
checkpoint behaviour.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphtpu.core.config import UniWalkConfig
from graphtpu.core.graph import Graph
from graphtpu.dist.frontier import distributed_uniform_walks
from graphtpu.kernels.topk import topk_rows
from graphtpu.simrank.uniwalk import _first_meet_mask, _tile_increments


def distributed_uniwalk_simrank(
    g: Graph,
    mesh: Mesh,
    cfg: UniWalkConfig = UniWalkConfig(),
    key: Optional[jax.Array] = None,
    sources: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(topk values, topk indices) for the given sources (default: all).

    Sources are padded to a multiple of the mesh size; each device owns a
    contiguous source block (its "worker partition") and the walk frontier
    is exchanged by node ownership every hop.
    """
    if key is None:
        key = jax.random.key(0)
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    if sources is None:
        sources = np.arange(g.n_nodes, dtype=np.int32)
    sources = np.asarray(sources, np.int32)
    n = len(sources)
    pad = (-n) % n_dev
    src_p = np.concatenate([sources, np.zeros(pad, np.int32)]) if pad else sources
    n_p = len(src_p)

    starts = jnp.repeat(jnp.asarray(src_p), cfg.sample)
    walks = distributed_uniform_walks(
        g,
        n_walkers=n_p * cfg.sample,
        num_steps=2 * cfg.step,
        key=key,
        mesh=mesh,
        starts=starts,
    )  # [n_p * S, 2*step+1], row-sharded over the mesh

    shard = NamedSharding(mesh, P(axis))
    row_shard = NamedSharding(mesh, P(axis, None))

    @partial(jax.jit, out_shardings=(row_shard, row_shard))
    def flush(walks, src):
        w = walks.reshape(n_p, cfg.sample, 2 * cfg.step + 1)
        w = jax.lax.with_sharding_constraint(
            w, NamedSharding(mesh, P(axis, None, None))
        )
        sim = _tile_increments(g, w, cfg.step, cfg.c, cfg.sample)
        rows = jnp.arange(n_p)
        sim = sim.at[rows, src].set(0.0)
        vals, idx = topk_rows(sim, cfg.topk)
        return vals, idx

    vals, idx = flush(walks, jax.device_put(jnp.asarray(src_p), shard))
    return np.asarray(vals)[:n], np.asarray(idx)[:n]


def distributed_uniwalk_simrank_reuse(
    g: Graph,
    mesh: Mesh,
    cfg: UniWalkConfig = UniWalkConfig(),
    key: Optional[jax.Array] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Distributed path-reuse UniWalk — the
    ``giraph/BatchSingleWalkVertexReuse`` analog (TIMES offsets per
    physical walk, ``BatchSingleWalkVertexReuse.java:39-56``).

    Every node launches ``sample // reuse_times`` walkers of length
    ``2*step + reuse_times - 1``; offset ``o`` of each walk is a fresh
    sample whose *source* is ``path[o]`` — an arbitrary node, so (as in
    Giraph, where sim-increment messages are routed to the source's
    owner) increments must cross shards.  The TPU mapping accumulates
    per-device partial rows and routes them home with one
    ``psum_scatter`` over the mesh: each device ends up owning its
    contiguous source-row block, applies the flush normalisation
    (per-source received-sample counts, ``flushTest`` semantics), and
    reduces to top-k locally.

    Returns (vals, idx), each [V, topk].
    """
    if key is None:
        key = jax.random.key(0)
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    v = g.n_nodes
    v_p = v + ((-v) % n_dev)
    times = max(cfg.reuse_times, 1)
    wpn = max(cfg.sample // times, 1)
    length = 2 * cfg.step + (times - 1)

    starts = np.repeat(np.arange(v, dtype=np.int32), wpn)
    pad = (-len(starts)) % n_dev
    if pad:
        # dead walkers: never routed, their rows stay -1 everywhere
        starts = np.concatenate([starts, np.full(pad, -1, np.int32)])
    walks = distributed_uniform_walks(
        g,
        n_walkers=len(starts),
        num_steps=length,
        key=key,
        mesh=mesh,
        starts=jnp.asarray(starts),
    )  # [B, length+1], row-sharded over the walker axis

    from jax import shard_map

    rows_per = v_p // n_dev
    deg = g.deg

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P(axis, None)),
    )
    def flush(walks_l):
        sim = jnp.zeros((v_p, v_p), jnp.float32)
        counts = jnp.zeros((v_p,), jnp.float32)
        for o in range(times):
            seg = walks_l[:, o : o + 2 * cfg.step + 1]
            src = seg[:, 0]
            live = src >= 0
            counts = counts.at[jnp.maximum(src, 0)].add(
                jnp.where(live, 1.0, 0.0)
            )
            for i in range(1, cfg.step + 1):
                inter = seg[:, i]
                target = seg[:, 2 * i]
                ok = (
                    live
                    & (target >= 0)
                    & (target != src)
                    & _first_meet_mask(seg, i)
                )
                val = (
                    (cfg.c ** i)
                    * deg[jnp.maximum(inter, 0)].astype(jnp.float32)
                    / jnp.maximum(
                        deg[jnp.maximum(target, 0)], 1
                    ).astype(jnp.float32)
                )
                sim = sim.at[
                    jnp.maximum(src, 0), jnp.maximum(target, 0)
                ].add(jnp.where(ok, val, 0.0))
        # route partial rows to their owner shard (the Giraph sim-message
        # routing, as ONE reduce_scatter instead of per-message RPC)
        sim = jax.lax.psum_scatter(
            sim, axis, scatter_dimension=0, tiled=True
        )  # [rows_per, v_p]
        counts = jax.lax.psum(counts, axis)
        me = jax.lax.axis_index(axis)
        local_rows = me * rows_per + jnp.arange(rows_per)
        sim = sim / jnp.maximum(counts[local_rows], 1.0)[:, None]
        sim = sim.at[jnp.arange(rows_per), local_rows].set(0.0)
        return topk_rows(sim, cfg.topk)

    vals, idx = jax.jit(flush)(walks)
    return np.asarray(vals)[:v], np.asarray(idx)[:v]
