"""Distributed TopSim — the flagship Giraph run's role.

``giraph/CombineBatchSingleWalkVertexReuse`` distributes budget-splitting
walks over 14 workers with combined walker-count messages
(``mySendMsg :139-161``): a single message carries a walker *count*; at
each hop it splits ``avg = count/degree`` mass over every edge plus
remainder singles to random neighbours, and sim increments route back to
the source's owner.  Our single-chip TopSim kernel
(:mod:`graphtpu.simrank.topsim`) already *is* that combined-message
semantics (mass splitting); this module distributes it two ways:

* replicated ``Graph``: shard the *source* axis over the mesh — each
  device expands its own source block's frontiers locally, zero
  collectives (the reference's source-batching parallelism).
* partitioned :class:`ShardedGraph`: frontier items (path, mass) live at
  their current node's OWNER device, expand against only the local CSR
  block, and children are routed to their own owners with one
  ``all_to_all`` per depth; sim increments are item-routed to the
  source's owner at flush (the exact ``mySendMsg`` message cycle — no
  device ever holds the full adjacency).
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
from graphtpu.dist.frontier import exchange_by_owner
from graphtpu.dist.sharded_graph import ShardedGraph, local_graph
from graphtpu.kernels.sampling import uniform_neighbor
from graphtpu.kernels.topk import pair_topk_by_source, segment_topk
from graphtpu.simrank.topsim import _expand_frontier
from graphtpu.simrank.uniwalk import _first_meet_mask


def distributed_topsim_simrank(
    g,
    mesh: Mesh,
    cfg: TopSimConfig = TopSimConfig(),
    key: Optional[jax.Array] = None,
    sources: Optional[np.ndarray] = None,
    device_capacity: Optional[int] = None,
    route_slack: float = 4.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(values [N, topk], indices [N, topk]) for the given sources.

    ``g`` may be a replicated :class:`Graph` (source-sharded, collective-
    free) or a partitioned :class:`ShardedGraph` (owner-exchange per
    depth; see module docstring).
    """
    if isinstance(g, ShardedGraph):
        return _topsim_sharded(
            g, mesh, cfg, key, sources, device_capacity, route_slack
        )
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


def _topsim_sharded(
    g: ShardedGraph,
    mesh: Mesh,
    cfg: TopSimConfig,
    key: Optional[jax.Array],
    sources: Optional[np.ndarray],
    device_capacity: Optional[int],
    route_slack: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """TopSim over a partitioned CSR: frontier items live at their current
    node's owner, expand against the local shard, and children route to
    their own owners each depth (``mySendMsg``,
    ``CombineBatchSingleWalkVertexReuse.java:139-161``); increments are
    item-routed to the source's owner at flush.  Per-device state is
    O(window·w_cap/n_dev · slack) — no device holds the full adjacency or
    the full frontier."""
    from jax import shard_map

    from graphtpu.kernels.topk import segment_sum_1d

    if key is None:
        key = jax.random.key(0)
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    if sources is None:
        sources = np.arange(g.n_nodes, dtype=np.int32)
    sources = np.asarray(sources, np.int32)
    n = len(sources)
    per_out = min(cfg.source_tile, max(1, -(-n // n_dev)))
    window = per_out * n_dev
    w_cap = cfg.frontier_capacity or (2 * math.ceil(cfg.sample) + 8)
    length = 2 * cfg.step + 1
    nodes_per = g.nodes_per

    # byte/short-packed wire formats (Short_2MixMsgWritable.java,
    # ByteArrayWritable.java): positions and node ids ship in the
    # narrowest signed dtype their range fits
    from graphtpu.dist.frontier import narrowest_int_dtype

    wd_pos = narrowest_int_dtype(window - 1)
    wd_node = narrowest_int_dtype(g.n_nodes - 1)
    cap0 = device_capacity or int(
        math.ceil(route_slack * window * w_cap / n_dev)
    )
    bucket = max(per_out, -(-cap0 // n_dev))
    cap = bucket * n_dev          # post-exchange item count per device
    exp_cap = 2 * cap             # expansion output slots
    inc_bucket = max(
        64, int(math.ceil(route_slack * cfg.step * exp_cap / n_dev))
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(axis), P(), P(axis, None), P(axis, None), P(axis, None), P(),
        ),
        out_specs=(P(axis, None), P(axis, None), P(axis)),
    )
    def run_window(src_l, key_r, rp_b, col_b, deg_b, deg_g):
        me = jax.lax.axis_index(axis)
        g_loc = local_graph(rp_b, col_b, deg_b, g.max_degree)
        kdev = jax.random.fold_in(key_r[0], me)
        degf = deg_g.astype(jnp.float32)

        # initial items: my block of window positions, at position-owner
        src_pos = jnp.full((per_out,), -1, jnp.int32).at[:].set(
            me * per_out + jnp.arange(per_out, dtype=jnp.int32)
        )
        paths = jnp.full((per_out, length), -1, jnp.int32)
        paths = paths.at[:, 0].set(src_l)
        mass = jnp.full((per_out,), float(cfg.sample), jnp.float32)

        inc_src, inc_tgt, inc_val = [], [], []
        lost = jnp.zeros((), jnp.float32)
        for depth in range(2 * cfg.step):
            # 1. route items to the owner of their current node
            cur = paths[:, depth]
            ok = (src_pos >= 0) & (cur >= 0) & (mass > 0)
            owner = jnp.where(ok, cur // nodes_per, -1)
            sent = jax.lax.psum(jnp.where(ok, mass, 0.0).sum(), axis)
            payloads = (src_pos, mass) + tuple(
                paths[:, j] for j in range(depth + 1)
            )
            recv, valid = exchange_by_owner(
                payloads, owner, axis, n_dev, bucket,
                wire_dtypes=(wd_pos, None)
                + (wd_node,) * (len(payloads) - 2),
            )
            r_pos = recv[0]
            r_mass = jnp.where(valid, recv[1], 0.0)
            r_paths = jnp.full((cap, length), -1, jnp.int32)
            for j in range(depth + 1):
                r_paths = r_paths.at[:, j].set(
                    jnp.where(valid, recv[2 + j], -1)
                )
            lost += sent - jax.lax.psum(r_mass.sum(), axis)

            # 2. expand against the LOCAL shard (budget splitting)
            cur_g = r_paths[:, depth]
            loc = jnp.where(cur_g >= 0, cur_g - me * nodes_per, -1)
            d = jnp.where(loc >= 0, g_loc.deg[jnp.maximum(loc, 0)], 0)
            active = (r_mass > 0) & (loc >= 0) & (d > 0)
            split = active & (r_mass >= d.astype(jnp.float32))
            nchild = jnp.where(split, d, jnp.ceil(r_mass).astype(jnp.int32))
            nchild = jnp.where(active, nchild, 0)
            offs = jnp.cumsum(nchild) - nchild
            total = offs[-1] + nchild[-1]
            slots = jnp.arange(exp_cap)
            parent = jnp.clip(
                jnp.searchsorted(offs, slots, side="right") - 1, 0, cap - 1
            )
            rank = slots - offs[parent]
            p_n = nchild[parent]
            validc = (slots < total) & (rank >= 0) & (rank < p_n)
            p_loc = loc[parent]
            p_mass = r_mass[parent]
            p_split = split[parent]
            base = g_loc.row_ptr[jnp.maximum(p_loc, 0)].astype(jnp.int32)
            split_node = g_loc.col[
                jnp.minimum(
                    base + rank.astype(jnp.int32), g_loc.col.shape[0] - 1
                )
            ]
            kdev, ks = jax.random.split(kdev)
            samp_node = uniform_neighbor(
                g_loc, jnp.where(validc, p_loc, -1), ks
            )
            node = jnp.where(p_split, split_node, samp_node)
            node = jnp.where(validc, node, -1)
            child_mass = jnp.where(
                validc, p_mass / jnp.maximum(p_n, 1), 0.0
            )
            c_paths = r_paths[parent]
            c_paths = c_paths.at[:, depth + 1].set(node)
            c_paths = jnp.where(validc[:, None], c_paths, -1)
            c_pos = jnp.where(validc, r_pos[parent], -1)
            lost += jax.lax.psum(
                jnp.where(active, r_mass, 0.0).sum() - child_mass.sum(), axis
            )

            # 3. sim increments at even depths (first-meet rule)
            lvl = depth + 1
            if lvl % 2 == 0:
                i = lvl // 2
                inter = c_paths[:, i]
                target = c_paths[:, 2 * i]
                okk = (
                    validc
                    & (target >= 0)
                    & (target != c_paths[:, 0])
                    & _first_meet_mask(c_paths[None, :, : 2 * i + 1], i)[0]
                )
                val = (
                    child_mass
                    * (cfg.c ** i)
                    * degf[jnp.maximum(inter, 0)]
                    / jnp.maximum(degf[jnp.maximum(target, 0)], 1.0)
                )
                if cfg.normalize:
                    val = val / cfg.sample
                inc_src.append(jnp.where(okk, c_pos, -1))
                inc_tgt.append(jnp.where(okk, target, -1))
                inc_val.append(jnp.where(okk, val, 0.0))

            src_pos, mass, paths = c_pos, child_mass, c_paths

        # 4. flush: route increments to the source-position owner and
        # reduce to top-k (scatter-free, the Giraph sim-message routing)
        a_src = jnp.concatenate(inc_src)
        a_tgt = jnp.concatenate(inc_tgt)
        a_val = jnp.concatenate(inc_val)
        owner = jnp.where(a_src >= 0, a_src // per_out, -1)
        per_owner = segment_sum_1d(
            owner, jnp.ones_like(a_val), n_dev
        )
        lost += jax.lax.psum(
            jnp.maximum(per_owner - inc_bucket, 0.0).sum(), axis
        )
        (f_src, f_tgt, f_val), fvalid = exchange_by_owner(
            (a_src, a_tgt, a_val), owner, axis, n_dev, inc_bucket,
            wire_dtypes=(wd_pos, wd_node, None),
        )
        f_val = jnp.where(fvalid, f_val, 0.0)
        local_ids = me * per_out + jnp.arange(per_out, dtype=jnp.int32)
        gv, gi = pair_topk_by_source(
            f_src.astype(jnp.int32),
            f_tgt.astype(jnp.int32),
            f_val,
            local_ids,
            cfg.topk,
        )
        return gv, gi, lost[None]

    run = jax.jit(run_window)
    out_vals = np.zeros((n, cfg.topk), np.float32)
    out_idx = np.zeros((n, cfg.topk), np.int32)
    for lo in range(0, n, window):
        hi = min(lo + window, n)
        chunk = sources[lo:hi]
        if len(chunk) < window:
            chunk = np.concatenate(
                [chunk, np.zeros(window - len(chunk), np.int32)]
            )
        gv, gi, lost = run(
            jnp.asarray(chunk),
            jnp.stack([jax.random.fold_in(key, lo)]),
            g.row_ptr,
            g.col,
            g.deg,
            g.deg_global,
        )
        if float(np.asarray(lost)[0]) > 1e-3 * cfg.sample * window:
            raise RuntimeError(
                f"topsim shard exchange dropped {float(np.asarray(lost)[0]):.1f} "
                f"mass; raise route_slack/device_capacity "
                f"(bucket={bucket}, inc_bucket={inc_bucket})"
            )
        m = hi - lo
        out_vals[lo:hi] = np.asarray(gv)[:m]
        out_idx[lo:hi] = np.asarray(gi)[:m]
    return out_vals, out_idx
