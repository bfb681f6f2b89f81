"""Why does the fori_loop SimRank iterate run 6x slower per iteration than
the identical body jitted alone?  Suspects: the [V,V] eye constant in the
body, loop-invariant w.T not hoisted, buffer copies.  Time variants."""

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


def bench(name, fn, *args, iters=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.1f} ms/iter", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    g = graphtpu.read_edgelist_graph(BLOG, n_nodes=10496)
    w = row_normalized(dense_adjacency(g))
    w.block_until_ready()
    v = w.shape[0]
    wt = jax.jit(lambda x: x.T.copy())(w)
    wt.block_until_ready()

    def diag_mask(s, val_diag):
        r = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        c = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        return jnp.where(r == c, val_diag, s)

    # A: current body (eye constant), fori_loop
    @partial(jax.jit, static_argnames="n")
    def loop_eye(w, n):
        eye = jnp.eye(v, dtype=w.dtype)

        def body(_, s):
            s = 0.6 * (w @ (s @ w.T))
            return s * (1 - eye) + eye

        s = jax.lax.fori_loop(0, n, body, eye)
        return s * (1 - eye)

    # B: iota diag mask, fori_loop, still w.T in body
    @partial(jax.jit, static_argnames="n")
    def loop_iota(w, n):
        def body(_, s):
            s = 0.6 * (w @ (s @ w.T))
            return diag_mask(s, 1.0)

        s = jax.lax.fori_loop(0, n, body, diag_mask(jnp.zeros_like(w), 1.0))
        return diag_mask(s, 0.0)

    # C: iota diag mask + pre-transposed wt arg
    @partial(jax.jit, static_argnames="n")
    def loop_iota_wt(w, wt, n):
        def body(_, s):
            s = 0.6 * (w @ (s @ wt))
            return diag_mask(s, 1.0)

        s = jax.lax.fori_loop(0, n, body, diag_mask(jnp.zeros_like(w), 1.0))
        return diag_mask(s, 0.0)

    # D: same as C but scan (in case fori_loop disables something)
    @partial(jax.jit, static_argnames="n")
    def scan_iota_wt(w, wt, n):
        def body(s, _):
            s = 0.6 * (w @ (s @ wt))
            return diag_mask(s, 1.0), None

        s, _ = jax.lax.scan(body, diag_mask(jnp.zeros_like(w), 1.0), None, length=n)
        return diag_mask(s, 0.0)

    # E: unrolled 10 iterations in one jit
    @partial(jax.jit, static_argnames="n")
    def unrolled(w, wt, n):
        s = diag_mask(jnp.zeros_like(w), 1.0)
        for _ in range(n):
            s = 0.6 * (w @ (s @ wt))
            s = diag_mask(s, 1.0)
        return diag_mask(s, 0.0)

    bench("A fori_loop + eye const + w.T", loop_eye, w, 10)
    bench("B fori_loop + iota mask + w.T", loop_iota, w, 10)
    bench("C fori_loop + iota mask + wt arg", loop_iota_wt, w, wt, 10)
    bench("D scan + iota mask + wt arg", scan_iota_wt, w, wt, 10)
    bench("E unrolled x10 + iota mask + wt arg", unrolled, w, wt, 10)


if __name__ == "__main__":
    main()
