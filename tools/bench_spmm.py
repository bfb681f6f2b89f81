"""Time SpMM SimRank vs the dense MXU form on the real TPU (blog scale).

Usage: python tools/bench_spmm.py [iters] [width] [col_block]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import graphtpu
    from graphtpu.core.graph import dense_adjacency, row_normalized
    from graphtpu.kernels.spmm import build_reduction_tree, tree_spmm
    from graphtpu.simrank.exact import _simrank_iterate

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    col_block = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    BLOG = "/root/reference/DeepSim/lshrank_data/realdata/blog.txt"
    g = graphtpu.read_edgelist_graph(BLOG, n_nodes=10496)
    v = g.n_nodes
    print(f"V={v} slots={g.n_edges}", flush=True)

    tree = build_reduction_tree(g, width=width)
    print(
        f"tree: width={width} levels={[l.shape for l in tree.levels]} "
        f"pad_ratio={tree.levels[0].shape[0]*width/g.n_edges:.2f}",
        flush=True,
    )

    from graphtpu.core.config import SimRankConfig
    from graphtpu.simrank.exact import exact_simrank_spmm

    t0 = time.time()
    s = exact_simrank_spmm(g, SimRankConfig(iterations=iters))
    s.block_until_ready()
    print(f"spmm warmup(compile + run): {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        s2 = exact_simrank_spmm(g, SimRankConfig(iterations=iters))
        s2.block_until_ready()
        best = min(best, (time.time() - t0) / iters)
        del s2
    print(f"spmm(streaming) per-iter: {best*1e3:.1f} ms", flush=True)
    s = jnp.asarray(s)

    # parity vs dense f32 (highest)
    w = row_normalized(dense_adjacency(g))
    t0 = time.time()
    s_hi = _simrank_iterate(w, 0.6, iters, "highest")
    s_hi.block_until_ready()
    t_hi = (time.time() - t0) / iters
    t0 = time.time()
    s_hi = _simrank_iterate(w, 0.6, iters, "highest")
    s_hi.block_until_ready()
    t_hi = min(t_hi, (time.time() - t0) / iters)
    err = float(jnp.max(jnp.abs(s - s_hi)))
    print(
        f"dense highest per-iter: {t_hi*1e3:.1f} ms; max|spmm-dense|={err:.2e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
