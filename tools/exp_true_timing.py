"""Correctly-timed SimRank iterate variants: warm up the EXACT executable
(same static iteration count) before timing, so compile time stays out of
the measured region.  This is the methodology bug that inflated every
prior per-iter number (~150 ms/iter of amortised compile)."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import graphtpu
from graphtpu.core.graph import dense_adjacency, row_normalized
from graphtpu.simrank.exact import _simrank_iterate
from tools.exp_bf16x3 import it_mask

BLOG = "/root/reference/DeepSim/lshrank_data/realdata/blog.txt"


def bench(name, fn, *args, iters=10, reps=3):
    r = fn(*args)        # compile + warm the same executable
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.time() - t0) / iters)
    print(f"{name:34s} {best*1e3:8.1f} ms/iter", flush=True)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    g = graphtpu.read_edgelist_graph(BLOG, n_nodes=10496)
    w = row_normalized(dense_adjacency(g))
    w.block_until_ready()

    bench("default (bf16)", partial(_simrank_iterate, matmul_precision="default"),
          w, 0.6, 10)
    bench("high (xla bf16x3)", partial(_simrank_iterate, matmul_precision="high"),
          w, 0.6, 10)
    bench("highest (f32)", partial(_simrank_iterate, matmul_precision="highest"),
          w, 0.6, 10)
    bench("mask-split bf16x3", it_mask, w, 0.6, 10)


if __name__ == "__main__":
    main()
