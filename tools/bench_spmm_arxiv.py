"""Streaming SpMM SimRank at arxiv scale vs the dense 1.25 s/iter.

Usage: python tools/bench_spmm_arxiv.py [iters] [mode]   # mode: kahan|fast
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
    from graphtpu.core.config import SimRankConfig
    from graphtpu.simrank.exact import exact_simrank_spmm

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    mode = sys.argv[2] if len(sys.argv) > 2 else "kahan"

    ARXIV = "/root/reference/DeepSim/lshrank_data/realdata/arxiv_author_pub.txt"
    g = graphtpu.read_edgelist_graph(ARXIV, n_nodes=38912)
    print(f"V={g.n_nodes} slots={g.n_edges} max_deg={g.max_degree}", flush=True)

    t0 = time.time()
    s = exact_simrank_spmm(g, SimRankConfig(iterations=iters), spmv_mode=mode)
    s.block_until_ready()
    warm = time.time() - t0
    print(f"first run (compile + {iters} iters): {warm:.1f}s", flush=True)
    sl = np.asarray(s[:2, :6])
    print("corner:", np.round(sl, 6)[0], flush=True)
    del s  # two live [V,V] f32 iterates would exceed HBM
    t0 = time.time()
    s = exact_simrank_spmm(g, SimRankConfig(iterations=iters), spmv_mode=mode)
    s.block_until_ready()
    per = (time.time() - t0) / iters
    print(
        f"spmm per-iter: {per*1e3:.1f} ms  "
        f"(dense bf16 reference 1250 ms -> {1.25/per:.1f}x)",
        flush=True,
    )


if __name__ == "__main__":
    main()
