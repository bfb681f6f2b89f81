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
from graphtpu.simrank.uniwalk import _tile_increments


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
