"""Walk-throughput measurement on the real TPU (warm-executable timing)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import graphtpu
from graphtpu.walks.node2vec import node2vec_walks

BLOG = "/root/reference/DeepSim/lshrank_data/realdata/blog.txt"


def main():
    from graphtpu.kernels.edgeset import device_edge_set

    g = graphtpu.read_edgelist_graph(BLOG, n_nodes=10496)
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    es = device_edge_set(g)
    jax.block_until_ready(es.words if es.words is not None else es.table)
    print(f"edge set ({es.mode}): {time.time()-t0:.1f}s", flush=True)
    fn = jax.jit(
        lambda s, k, e: node2vec_walks(g, s, 80, 0.25, 0.25, k, eset=e)
    )
    for b in (10240, 102400):
        starts = jnp.asarray(
            np.random.default_rng(0).integers(0, 10313, b).astype(np.int32)
        )
        t0 = time.time()
        w = fn(starts, jax.random.key(0), es)
        w.block_until_ready()
        print(f"B={b}: compile+run {time.time() - t0:.1f}s", flush=True)
        best = 1e9
        for r in range(3):
            t0 = time.time()
            w = fn(starts, jax.random.key(r), es)
            w.block_until_ready()
            best = min(best, time.time() - t0)
        print(
            f"B={b}: {best * 1e3:.0f} ms -> {b * 80 / best / 1e6:.2f} M hops/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
