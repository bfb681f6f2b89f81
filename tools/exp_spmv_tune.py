"""Tune the streaming SpMV kernel: ring depth, raw per-item cost."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import graphtpu
    from graphtpu.kernels.spmm import build_spmv_stream, spmv_pallas

    ARXIV = "/root/reference/DeepSim/lshrank_data/realdata/arxiv_author_pub.txt"
    g = graphtpu.read_edgelist_graph(ARXIV, n_nodes=38912)
    stream = build_spmv_stream(g)
    t = stream.slots.shape[0]
    c = 38912
    print(f"items={stream.n_items} padded={t}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((g.n_nodes, c), dtype=np.float32))
    x.block_until_ready()

    for nbuf in [8, 16, 32, 64]:
        f = jax.jit(lambda s, x, nbuf=nbuf: spmv_pallas(s, x, nbuf=nbuf))
        y = f(stream, x)
        y.block_until_ready()
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            f(stream, x).block_until_ready()
            best = min(best, time.time() - t0)
        gb = (t + g.n_nodes) * c * 4 / 1e9
        print(
            f"nbuf={nbuf}: {best*1e3:7.1f} ms  {best/t*1e9:5.0f} ns/item  "
            f"{gb/best:4.0f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
