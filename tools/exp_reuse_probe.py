"""Bisect the flagship reuse tile: time each stage separately on the TPU
to find what stalls (walks / reuse items / counts / pair topk)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import graphtpu
from graphtpu.kernels.topk import pair_topk_by_source, segment_sum_1d
from graphtpu.simrank.uniwalk import _reuse_items
from graphtpu.walks.walker import uniform_walks


def t(label, fn, *a):
    t0 = time.time()
    out = fn(*a)
    jax.block_until_ready(out)
    print(f"{label}: compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = fn(*a)
    jax.block_until_ready(out)
    print(f"{label}: warm {time.time()-t0:.2f}s", flush=True)
    return out


def main():
    v, tile, wpn, step, times = 100_000, 512, 250, 5, 4
    length = 2 * step + (times - 1)
    path = f"/tmp/g_{v}_8.txt"
    g = graphtpu.load_graph_cached(path, n_nodes=v)
    print(f"graph: V={g.n_nodes} slots={g.n_edges}", flush=True)

    chunk = np.arange(tile, dtype=np.int32)
    starts = jnp.repeat(jnp.asarray(chunk), wpn)
    key = jax.random.key(0)

    walk_fn = jax.jit(lambda gg, s, k: uniform_walks(gg, s, length, k))
    walks = t("walks", walk_fn, g, starts, key)

    items_fn = jax.jit(
        lambda d, w: _reuse_items(d, w, step, 0.6, times)
    )
    srcs, tgts, vals, cnt = t("reuse_items", items_fn, g.deg, walks)
    print("items:", srcs.shape, flush=True)

    counts_fn = jax.jit(
        lambda c: segment_sum_1d(c, jnp.ones_like(c, jnp.float32), v)
    )
    counts = t("counts", counts_fn, cnt)

    topk_fn = jax.jit(
        lambda s_, t_, v_, ids, c_: pair_topk_by_source(
            s_, t_, v_, ids, 20, counts=c_
        )
    )
    t("pair_topk", topk_fn, srcs, tgts, vals, jnp.asarray(chunk), counts)


if __name__ == "__main__":
    main()
