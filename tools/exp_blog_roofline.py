"""Isolate why blog-scale (V=10496) SimRank iterates run ~7x off roofline
while arxiv-scale (V=38912) hits peak.  Times individual pieces."""

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

BLOG = "/root/reference/DeepSim/lshrank_data/realdata/blog.txt"


def timeit(name, fn, *args, n=10, flops=None):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / n
    extra = f"  {flops / dt / 1e12:7.1f} TF/s" if flops else ""
    print(f"{name:42s} {dt*1e3:8.2f} ms{extra}", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    g = graphtpu.read_edgelist_graph(BLOG, n_nodes=10496)
    w32 = row_normalized(dense_adjacency(g))
    w32.block_until_ready()
    v = w32.shape[0]
    wbf = jax.jit(lambda x: x.astype(jnp.bfloat16))(w32)
    wtbf = jax.jit(lambda x: x.T.astype(jnp.bfloat16))(w32)
    s32 = jax.jit(lambda x: jnp.eye(v, dtype=jnp.float32) + 0 * x)(w32)
    sbf = jax.jit(lambda x: x.astype(jnp.bfloat16))(s32)
    jax.block_until_ready((wbf, wtbf, s32, sbf))
    mm_flops = 2.0 * v**3

    dot = jax.jit(partial(jnp.dot, preferred_element_type=jnp.float32))
    dot_bf_out = jax.jit(jnp.dot)

    # single matmuls
    timeit("dot f32xf32 (default prec)", dot, s32, w32, flops=mm_flops)
    timeit("dot bf16xbf16 -> f32", dot, sbf, wbf, flops=mm_flops)
    timeit("dot bf16xbf16 -> bf16", dot_bf_out, sbf, wbf, flops=mm_flops)
    timeit("dot f32 x bf16 -> f32", dot, s32, wbf, flops=mm_flops)

    # transpose contraction: s @ w.T
    dott = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32))
    timeit("dot_general s @ w.T (contract dim1)", dott, sbf, wbf, flops=mm_flops)
    timeit("dot s @ wt (pre-transposed)", dot, sbf, wtbf, flops=mm_flops)

    # full iterations
    eyem = jax.jit(lambda s: s * (1 - jnp.eye(v, dtype=s.dtype)) + jnp.eye(v, dtype=s.dtype))
    timeit("diag fix elementwise", eyem, s32)

    @jax.jit
    def iter_curr(w, s):
        s = 0.6 * (w @ (s @ w.T))
        e = jnp.eye(v, dtype=s.dtype)
        return s * (1 - e) + e

    @jax.jit
    def iter_pre_t(w, wt, s):
        sb = s.astype(jnp.bfloat16)
        t = jnp.dot(sb, wt, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        s = 0.6 * jnp.dot(w, t, preferred_element_type=jnp.float32)
        e = jnp.eye(v, dtype=s.dtype)
        return s * (1 - e) + e

    timeit("full iter (current: w@(s@w.T)) f32 in", iter_curr, w32, s32, flops=2 * mm_flops)
    timeit("full iter bf16 ops, pre-transposed", iter_pre_t, wbf, wtbf, s32, flops=2 * mm_flops)


if __name__ == "__main__":
    main()
