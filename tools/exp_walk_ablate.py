"""Ablate the node2vec hop cost on TPU: uniform walks only, rejection
panel without edge_exists, panel width sweep, threefry cost."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import graphtpu
from graphtpu.kernels.sampling import edge_exists, uniform_neighbor
from graphtpu.walks.node2vec import node2vec_walks
from graphtpu.walks.walker import uniform_walks

BLOG = "/root/reference/DeepSim/lshrank_data/realdata/blog.txt"
B, L = 102400, 80


def bench(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, time.time() - t0)
    print(f"{name:40s} {best*1e3:9.0f} ms  {B*L/best/1e6:8.2f} M hops/s", flush=True)


def main():
    g = graphtpu.read_edgelist_graph(BLOG, n_nodes=10496)
    print("devices:", jax.devices(), flush=True)
    starts = jnp.asarray(np.random.default_rng(0).integers(0, 10313, B).astype(np.int32))

    bench("uniform walks (1st order)",
          jax.jit(lambda s, k: uniform_walks(g, s, L, k)), starts, jax.random.key(0))

    def walks_t(t):
        return jax.jit(lambda s, k: node2vec_walks(
            g, s, L, 0.25, 0.25, k, max_trials=t))

    bench("node2vec panel T=4", walks_t(4), starts, jax.random.key(0))
    bench("node2vec panel T=8", walks_t(8), starts, jax.random.key(0))
    bench("node2vec panel T=24", walks_t(24), starts, jax.random.key(0))

    # scan of hops where each hop draws [B, 24] uniform neighbours but NO
    # edge_exists / acceptance logic (gather cost of the panel alone)
    @jax.jit
    def panel_gather_only(s, key):
        def step(cur, k):
            props = uniform_neighbor(g, jnp.broadcast_to(cur[:, None], (B, 24)), k)
            return props[:, 0], None
        keys = jax.random.split(key, L)
        out, _ = jax.lax.scan(step, s, keys)
        return out

    bench("panel gathers only (T=24, no bias)", panel_gather_only, starts, jax.random.key(0))

    # edge_exists alone on a [B, 24] panel per hop
    @jax.jit
    def bisect_only(s, key):
        def step(cur, k):
            props = uniform_neighbor(g, jnp.broadcast_to(cur[:, None], (B, 24)), k)
            hit = edge_exists(g, cur[:, None], props)
            return jnp.where(hit[:, 0], props[:, 0], cur), None
        keys = jax.random.split(key, L)
        out, _ = jax.lax.scan(step, s, keys)
        return out

    bench("panel + edge_exists (T=24)", bisect_only, starts, jax.random.key(0))

    # threefry cost alone
    @jax.jit
    def rng_only(s, key):
        def step(cur, k):
            u = jax.random.uniform(k, (B, 24))
            return cur + (u[:, 0] < 2).astype(jnp.int32) * 0, None
        keys = jax.random.split(key, L)
        out, _ = jax.lax.scan(step, s, keys)
        return out

    bench("threefry only (B x 24 per hop)", rng_only, starts, jax.random.key(0))


if __name__ == "__main__":
    main()
