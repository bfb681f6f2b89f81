"""Walk-gather coalescing via locality relabeling at flagship scale
(VERDICT r4 #3).

The 10M flagship's steady state is walk-gather bound at 5.6 M hops/s
(FLAGSHIP_r4.json): random access over a ~320 MB ``col`` array.  A
bandwidth-reducing relabeling (RCM) makes consecutive hop targets
reference nearby CSR slots, improving HBM locality with ZERO kernel
changes — this experiment measures the steady-state tile time on the
same graph before/after relabeling, with identical shapes so the second
set of tiles reuses the compiled executables.

Usage: python tools/exp_flagship_relabel.py [V] [avg_deg] [tiles] [tile]
Defaults V=10M: ~6 min including compiles on a clean member.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import graphtpu
    from graphtpu.core.reorder import locality_score, rcm_order, relabel_graph
    from graphtpu.kernels.topk import pair_topk_by_source, segment_sum_1d
    from graphtpu.native import native_generate_graph
    from graphtpu.simrank.uniwalk import _reuse_items
    from graphtpu.walks.walker import uniform_walks

    if jax.default_backend() != "cpu":
        from graphtpu.axon_pin import canary

        canary(timeout_s=180.0)

    v = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    avg_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_tiles = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    tile = int(sys.argv[4]) if len(sys.argv) > 4 else 2048
    sample, times, step, topk, c = 10_000, 4, 5, 20, 0.6
    wpn = sample // times
    length = 2 * step + (times - 1)

    path = f"/tmp/g_{v}_{avg_deg}.txt"
    if not os.path.exists(path):
        t0 = time.time()
        n = native_generate_graph(
            path, "uniform", v, 0, target_edges=v * avg_deg // 2, seed=1
        )
        print(f"generated {n} edges in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    g = graphtpu.load_graph_cached(path, n_nodes=v)
    print(f"graph load: {time.time()-t0:.1f}s  "
          f"locality={locality_score(g):.4f}", flush=True)

    maybe_jit = jax.jit

    @maybe_jit
    def walks_fn(gg, starts_rep, key):
        return uniform_walks(gg, starts_rep, length, key)

    @maybe_jit
    def walks_sorted_fn(gg, starts_rep, key):
        return uniform_walks(gg, starts_rep, length, key, sort_gather=True)

    @maybe_jit
    def items_fn(deg, walks):
        return _reuse_items(deg, walks, step, c, times)

    @maybe_jit
    def counts_fn(cnt_src):
        return segment_sum_1d(cnt_src, jnp.ones_like(cnt_src, jnp.float32), v)

    @maybe_jit
    def topk_fn(srcs, tgts, vals, srcs_sorted, counts):
        return pair_topk_by_source(
            srcs, tgts, vals, srcs_sorted, topk, counts=counts
        )

    def run_tiles(gg, tag, key, wf=None):
        wf = wf or walks_fn
        per = []
        for i in range(n_tiles):
            chunk = np.arange(i * tile, (i + 1) * tile, dtype=np.int32)
            starts = jnp.repeat(jnp.asarray(chunk), wpn)
            t0 = time.time()
            walks = wf(gg, starts, jax.random.fold_in(key, i))
            srcs, tgts, vals, cnt_src = items_fn(gg.deg, walks)
            counts = counts_fn(cnt_src)
            out = topk_fn(srcs, tgts, vals, jnp.asarray(chunk), counts)
            np.asarray(out[0])  # readback sync
            dt = time.time() - t0
            per.append(dt)
            print(f"  {tag} tile {i}: {dt:.1f}s "
                  f"({tile*wpn*length/dt/1e6:.1f} M hops/s)", flush=True)
        return per

    import faulthandler

    faulthandler.dump_traceback_later(600, repeat=True)
    key = jax.random.key(7)
    base = run_tiles(g, "base", key)
    srt = run_tiles(g, "sorted", key, wf=walks_sorted_fn)

    t0 = time.time()
    order = rcm_order(g)
    g2, _inv = relabel_graph(g, order)
    loc2 = locality_score(g2)
    print(f"rcm relabel: {time.time()-t0:.1f}s  locality={loc2:.4f}",
          flush=True)
    del g
    rel = run_tiles(g2, "rcm", key)
    rel_s = run_tiles(g2, "rcm+sorted", key, wf=walks_sorted_fn)

    hops = tile * wpn * length
    res = {
        "V": v, "tile": tile, "wpn": wpn, "length": length,
        "base_tile_s": [round(x, 2) for x in base],
        "sorted_tile_s": [round(x, 2) for x in srt],
        "rcm_tile_s": [round(x, 2) for x in rel],
        "rcm_sorted_tile_s": [round(x, 2) for x in rel_s],
        "base_steady_s": round(min(base[1:]), 2),
        "sorted_steady_s": round(min(srt[1:]), 2),
        "rcm_steady_s": round(min(rel[1:]), 2),
        "rcm_sorted_steady_s": round(min(rel_s[1:]), 2),
        "base_mhops": round(hops / min(base[1:]) / 1e6, 2),
        "sorted_mhops": round(hops / min(srt[1:]) / 1e6, 2),
        "rcm_mhops": round(hops / min(rel[1:]) / 1e6, 2),
        "rcm_sorted_mhops": round(hops / min(rel_s[1:]) / 1e6, 2),
        "rcm_locality": round(loc2, 4),
    }
    print(json.dumps(res), flush=True)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "flagship_relabel_r5.json",
    )
    with open(out, "w") as f:
        json.dump(res, f)


if __name__ == "__main__":
    main()
