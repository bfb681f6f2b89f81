"""Isolate SpMM cost components on the TPU and sweep width/col_block."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=3):
    out = fn(*args)
    import jax

    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    import graphtpu
    from graphtpu.kernels.spmm import build_reduction_tree, tree_spmm

    BLOG = "/root/reference/DeepSim/lshrank_data/realdata/blog.txt"
    g = graphtpu.read_edgelist_graph(BLOG, n_nodes=10496)
    v = g.n_nodes
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.random((v, v)).astype(np.float32))
    s.block_until_ready()

    # cost of a bare transpose copy
    tr = jax.jit(lambda x: x.T.copy())
    print(f"transpose+copy [V,V]: {timeit(tr, s)*1e3:.1f} ms", flush=True)

    # bare gather throughput: one [M,8] level over 4096 cols
    tree8 = build_reduction_tree(g, width=8)
    m1 = tree8.levels[0].shape[0]

    def one_level(x, slots):
        ext = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)])
        acc = None
        for j in range(8):
            r = ext[slots[:, j]]
            acc = r if acc is None else acc + r
        return acc

    lv = jax.jit(one_level)
    xb = s[:, :4096]
    t = timeit(lv, xb, tree8.levels[0])
    gb = m1 * 8 * 4096 * 4 / 1e9
    print(
        f"level1 gather(8x{m1}) over 4096 cols: {t*1e3:.1f} ms "
        f"({gb:.1f} GB read -> {gb/t:.0f} GB/s)",
        flush=True,
    )

    for width, cb in [(8, v), (16, 4096), (16, v), (32, v)]:
        tree = build_reduction_tree(g, width=width)

        def spmm(x, tree=tree, cb=cb):
            return tree_spmm(tree, x, col_block=cb)

        f = jax.jit(spmm)
        t = timeit(f, s)
        print(
            f"width={width} col_block={cb}: tree_spmm {t*1e3:.1f} ms "
            f"(levels {[l.shape[0] for l in tree.levels]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
