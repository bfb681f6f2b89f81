"""Distributed TopSim — the flagship Giraph run's role.

``giraph/CombineBatchSingleWalkVertexReuse`` distributes budget-splitting
walks over 14 workers with combined walker-count messages
(``mySendMsg :139-161``).  Our single-chip TopSim kernel
(:mod:`graphtpu.simrank.topsim`) already *is* the combined-message
semantics (mass splitting); scaling out means sharding the source axis
over the mesh — each device expands the frontiers of its own source block
(batch windows within each shard bound memory exactly like BATCH=40000
did).  The graph operands are replicated (CSR shards ride in later
rounds); GSPMD partitions every per-source tensor [T, ...] by the leading
axis, so frontier expansion, first-meet masks, and segment top-k all run
shard-local with zero collectives — the embarrassingly-parallel structure
the reference exploited with source batching.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphtpu.core.config import TopSimConfig
from graphtpu.core.graph import Graph
from graphtpu.kernels.topk import segment_topk
from graphtpu.simrank.topsim import _expand_frontier
from graphtpu.simrank.uniwalk import _first_meet_mask


def distributed_topsim_simrank(
    g: Graph,
    mesh: Mesh,
    cfg: TopSimConfig = TopSimConfig(),
    key: Optional[jax.Array] = None,
    sources: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(values [N, topk], indices [N, topk]); sources sharded over 'data'."""
    if key is None:
        key = jax.random.key(0)
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    if sources is None:
        sources = np.arange(g.n_nodes, dtype=np.int32)
    sources = np.asarray(sources, np.int32)
    n = len(sources)
    per_dev = min(cfg.source_tile, max(1, -(-n // n_dev)))
    window = per_dev * n_dev
    cap = cfg.frontier_capacity or (2 * math.ceil(cfg.sample) + 8)
    length = 2 * cfg.step + 1
    shard = NamedSharding(mesh, P(axis))
    row_shard = NamedSharding(mesh, P(axis, None))

    @partial(jax.jit, out_shardings=(row_shard, row_shard))
    def run_window(src: jax.Array, k: jax.Array):
        t = window
        paths = jnp.full((t, cap, length), -1, jnp.int32)
        paths = paths.at[:, 0, 0].set(src)
        mass = jnp.zeros((t, cap), jnp.float32).at[:, 0].set(cfg.sample)
        deg = g.deg
        tgt_list, val_list = [], []
        for depth in range(2 * cfg.step):
            paths, mass, _ = _expand_frontier(
                g, paths, mass, depth, jax.random.fold_in(k, depth)
            )
            paths = jax.lax.with_sharding_constraint(
                paths, NamedSharding(mesh, P(axis, None, None))
            )
            lvl = depth + 1
            if lvl % 2 == 0:
                i = lvl // 2
                inter = paths[:, :, i]
                target = paths[:, :, 2 * i]
                ok = (
                    (mass > 0)
                    & (target >= 0)
                    & (target != src[:, None])
                    & _first_meet_mask(paths[:, :, : 2 * i + 1], i)
                )
                val = (
                    mass
                    * (cfg.c ** i)
                    * deg[jnp.maximum(inter, 0)].astype(jnp.float32)
                    / jnp.maximum(deg[jnp.maximum(target, 0)], 1).astype(
                        jnp.float32
                    )
                )
                if cfg.normalize:
                    val = val / cfg.sample
                tgt_list.append(jnp.where(ok, target, -1))
                val_list.append(jnp.where(ok, val, 0.0))
        targets = jnp.concatenate(tgt_list, axis=1)
        vals = jnp.concatenate(val_list, axis=1)
        return segment_topk(targets, vals, cfg.topk, g.n_nodes)

    out_vals = np.zeros((n, cfg.topk), np.float32)
    out_idx = np.zeros((n, cfg.topk), np.int32)
    for lo in range(0, n, window):
        hi = min(lo + window, n)
        chunk = sources[lo:hi]
        if len(chunk) < window:
            chunk = np.concatenate(
                [chunk, np.zeros(window - len(chunk), np.int32)]
            )
        vals, idx = run_window(
            jax.device_put(jnp.asarray(chunk), shard),
            jax.random.fold_in(key, lo),
        )
        m = hi - lo
        out_vals[lo:hi] = np.asarray(vals)[:m]
        out_idx[lo:hi] = np.asarray(idx)[:m]
    return out_vals, out_idx
