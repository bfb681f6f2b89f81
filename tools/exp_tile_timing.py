"""Quantify the flagship reuse-tile cost: jitted stages vs GRAPHTPU_EAGER
(VERDICT r3 #3 "quantify the eager-mode tax").

Runs, on the pinned pool member:
  1. canary
  2. V=100k tile (tile=512, wpn=250): staged-jit compile + 3 warm tiles
  3. the same tile eager (per-op dispatch)  [skip with --no-eager]
  4. V=10M tile at the reference budget shape (tile=2048, wpn=2500):
     staged-jit compile + 2 timed tiles

Reference shape: ``giraph/CombineBatchSingleWalkVertexReuse.java:39-48``.
Usage: PALLAS_AXON_POOL_IPS= GRAPHTPU_AXON_MEMBER=8xx2 python tools/exp_tile_timing.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEP, TOPK, C, TIMES = 5, 20, 0.6, 4
LENGTH = 2 * STEP + (TIMES - 1)


def make_stages(v, jitted):
    import jax
    import jax.numpy as jnp

    from graphtpu.kernels.topk import pair_topk_by_source, segment_sum_1d
    from graphtpu.simrank.uniwalk import _reuse_items
    from graphtpu.walks.walker import uniform_walks

    wrap = jax.jit if jitted else (lambda f: f)

    walks_fn = wrap(lambda gg, s, k: uniform_walks(gg, s, LENGTH, k))
    items_fn = wrap(lambda deg, w: _reuse_items(deg, w, STEP, C, TIMES))
    counts_fn = wrap(
        lambda cs: segment_sum_1d(cs, jnp.ones_like(cs, jnp.float32), v)
    )
    topk_fn = wrap(
        lambda s, t, vv, ss, cc: pair_topk_by_source(
            s, t, vv, ss, TOPK, counts=cc
        )
    )

    def tile_fn(g, starts_rep, srcs_sorted, key):
        w = walks_fn(g, starts_rep, key)
        srcs, tgts, vals, cnt = items_fn(g.deg, w)
        counts = counts_fn(cnt)
        out = topk_fn(srcs, tgts, vals, srcs_sorted, counts)
        jax.block_until_ready(out)
        return out

    return tile_fn


def time_tiles(g, tile, wpn, tile_fn, n_timed, key_seed=7):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(key_seed)
    res = []
    for i in range(n_timed + 1):  # first call = compile (logged separately)
        chunk = np.sort(
            rng.choice(g.n_nodes, size=tile, replace=False)
        ).astype(np.int32)
        starts = jnp.repeat(jnp.asarray(chunk), wpn)
        key = jax.random.key(100 + i)
        t0 = time.time()
        out = tile_fn(g, starts, jnp.asarray(chunk), key)
        dt = time.time() - t0
        # real readback (tiny): proves execution completed
        _ = float(np.asarray(out[0])[0, 0])
        res.append(dt)
        hops = tile * wpn * LENGTH
        print(
            f"    tile {i}: {dt:.2f}s  ({hops/dt/1e6:.1f} M hops/s)",
            flush=True,
        )
    return res


def main():
    import jax

    import graphtpu
    from graphtpu.native import native_generate_graph

    if jax.default_backend() != "cpu":
        from graphtpu.axon_pin import canary

        canary(timeout_s=180.0)

    results = {}

    # --- V=100k ---
    path = "/tmp/g_100000_8.txt"
    if not os.path.exists(path):
        native_generate_graph(
            path, "uniform", 100_000, 0, target_edges=400_000, seed=1
        )
    g = graphtpu.load_graph_cached(path, n_nodes=100_000)
    print(f"100k graph loaded: slots={g.n_edges}", flush=True)

    tile, wpn = 512, 250
    print("[100k jit staged]", flush=True)
    t0 = time.time()
    ts = time_tiles(g, tile, wpn, make_stages(g.n_nodes, True), 3)
    results["jit_100k_compile_s"] = round(ts[0], 1)
    results["jit_100k_tile_s"] = round(min(ts[1:]), 2)
    results["jit_100k_mhops_s"] = round(
        tile * wpn * LENGTH / min(ts[1:]) / 1e6, 2
    )

    if "--no-eager" not in sys.argv:
        print("[100k eager]", flush=True)
        ts = time_tiles(g, tile, wpn, make_stages(g.n_nodes, False), 1)
        results["eager_100k_tile_s"] = round(min(ts[1:]), 2)
        results["eager_100k_mhops_s"] = round(
            tile * wpn * LENGTH / min(ts[1:]) / 1e6, 2
        )

    # --- V=10M at reference budget shape ---
    if "--no-10m" not in sys.argv:
        path = "/tmp/g_10000000_8.txt"
        if not os.path.exists(path):
            native_generate_graph(
                path, "uniform", 10_000_000, 0,
                target_edges=40_000_000, seed=1,
            )
        t0 = time.time()
        g10 = graphtpu.load_graph_cached(path, n_nodes=10_000_000)
        jax.block_until_ready(g10.deg)
        print(
            f"10M graph loaded+device: slots={g10.n_edges} "
            f"max_deg={g10.max_degree} {time.time()-t0:.1f}s",
            flush=True,
        )
        tile, wpn = 2048, 2500
        print("[10M jit staged, reference shape]", flush=True)
        ts = time_tiles(g10, tile, wpn, make_stages(g10.n_nodes, True), 2)
        results["jit_10m_compile_s"] = round(ts[0], 1)
        results["jit_10m_tile_s"] = round(min(ts[1:]), 2)
        results["jit_10m_mhops_s"] = round(
            tile * wpn * LENGTH / min(ts[1:]) / 1e6, 2
        )

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
