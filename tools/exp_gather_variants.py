"""Which XLA formulation of 'gather W rows and add' avoids materializing
each gathered [M, C] operand?  Candidates for the SpMM level kernel."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=3):
    import jax

    jax.block_until_ready(fn(*args))
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
    from graphtpu.kernels.spmm import build_reduction_tree

    BLOG = "/root/reference/DeepSim/lshrank_data/realdata/blog.txt"
    g = graphtpu.read_edgelist_graph(BLOG, n_nodes=10496)
    v = g.n_nodes
    tree = build_reduction_tree(g, width=8)
    slots = tree.levels[0]
    m1, w = slots.shape
    rng = np.random.default_rng(0)
    c = 4096
    x = jnp.asarray(rng.random((v + 1, c)).astype(np.float32))
    gb = m1 * w * c * 4 / 1e9

    def report(name, t):
        print(f"{name}: {t*1e3:7.1f} ms  ({gb/t:5.0f} GB/s logical)", flush=True)

    # A: separate gathers, tree adds (current)
    def va(x, slots):
        acc = None
        for j in range(w):
            r = x[slots[:, j]]
            acc = r if acc is None else acc + r
        return acc

    report("A sep-gathers ", timeit(jax.jit(va), x, slots))

    # B: one 3-D gather + reduce
    def vb(x, slots):
        return x[slots].sum(axis=1)

    report("B 3d-gather   ", timeit(jax.jit(vb), x, slots))

    # C: flattened gather + strided reshape reduce
    def vc(x, slots):
        return x[slots.reshape(-1)].reshape(m1, w, c).sum(axis=1)

    report("C flat-gather ", timeit(jax.jit(vc), x, slots))

    # D: fori_loop accumulate (forces single live temp)
    def vd(x, slots):
        def body(j, acc):
            return acc + x[slots[:, j]]

        return jax.lax.fori_loop(1, w, body, x[slots[:, 0]])

    report("D fori-acc    ", timeit(jax.jit(vd), x, slots))

    # E: bf16 table, f32 accumulate
    xb = x.astype(jnp.bfloat16)

    def ve(xb, slots):
        acc = None
        for j in range(w):
            r = xb[slots[:, j]].astype(jnp.float32)
            acc = r if acc is None else acc + r
        return acc

    report("E bf16-gather ", timeit(jax.jit(ve), xb, slots))


if __name__ == "__main__":
    main()
