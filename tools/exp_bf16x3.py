"""Experiment: hand-rolled bf16x3 SimRank iterate with a fold-proof
bit-mask operand split, vs XLA precision="high" and plain bf16.

Hypothesis from the stalled investigation: XLA:TPU's bfloat16
propagation folds f32->bf16->f32 convert pairs (treating bf16 rounding
as allowed excess precision), so a split computed as
``al = a - f32(bf16(a))`` silently becomes zero and the correction dots
contribute nothing.  Splitting via integer bit-masking cannot be folded.

Run on the real TPU:  python tools/exp_bf16x3.py
"""

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
MASK = jnp.uint32(0xFFFF0000)


def split_mask(a):
    """Fold-proof split: ah = top-16-bit truncation (exactly bf16
    representable), al = exact residual.  Both cast to bf16 losslessly /
    near-losslessly."""
    ai = jax.lax.bitcast_convert_type(a, jnp.uint32)
    ah = jax.lax.bitcast_convert_type(ai & MASK, jnp.float32)
    al = a - ah
    return ah.astype(jnp.bfloat16), al.astype(jnp.bfloat16)


def split_convert(a):
    """The foldable split (control: expect XLA to annihilate al)."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    return ah, al


def dot3(a, b, split):
    ah, al = split(a)
    bh, bl = split(b)
    f = partial(jnp.dot, preferred_element_type=jnp.float32)
    return f(ah, bh) + f(ah, bl) + f(al, bh)


def iterate_bf16x3(w, c, iterations, split):
    v = w.shape[0]
    eye_mask = (jnp.arange(v)[:, None] == jnp.arange(v)[None, :]).astype(jnp.float32)

    def body(_, s):
        t = dot3(s, w.T, split)
        s = c * dot3(w, t, split)
        return s * (1 - eye_mask) + eye_mask

    s = jax.lax.fori_loop(0, iterations, body, jnp.eye(v, dtype=jnp.float32))
    return s * (1 - eye_mask)


it_mask = jax.jit(partial(iterate_bf16x3, split=split_mask), static_argnames="iterations")
it_conv = jax.jit(partial(iterate_bf16x3, split=split_convert), static_argnames="iterations")


def main():
    from graphtpu.simrank.exact import _simrank_iterate

    print("devices:", jax.devices(), flush=True)
    g = graphtpu.read_edgelist_graph(BLOG, n_nodes=10496)
    w = row_normalized(dense_adjacency(g))
    w.block_until_ready()
    print("W resident", flush=True)

    def bench(name, fn, iters=10):
        t0 = time.time()
        s = fn(w, 0.6, 1)
        s.block_until_ready()
        compile_s = time.time() - t0
        t0 = time.time()
        s = fn(w, 0.6, iters)
        s.block_until_ready()
        dt = (time.time() - t0) / iters
        print(f"{name:28s} {dt*1e3:8.1f} ms/iter  (compile {compile_s:.0f}s)", flush=True)
        return dt

    def quality(name, fn, s_ref):
        s = np.asarray(fn(w, 0.6, 3)[:2048, :10313])
        err = np.abs(s - s_ref).max()
        # top-20 ranking agreement on first 512 rows
        agree = np.mean([
            len(set(np.argsort(-s[r])[:20]) & set(np.argsort(-s_ref[r])[:20])) / 20
            for r in range(512)
        ])
        print(f"{name:28s} max|err|={err:.2e}  top20 agree={agree:.4f}", flush=True)

    hi = partial(_simrank_iterate, matmul_precision="highest")
    xla_high = partial(_simrank_iterate, matmul_precision="high")
    bf16 = partial(_simrank_iterate, matmul_precision="default")

    bench("highest (f32)", hi, iters=3)
    bench("xla high (bf16x3)", xla_high)
    bench("plain bf16", bf16)
    bench("mask-split bf16x3", it_mask)
    bench("convert-split bf16x3", it_conv)

    s_ref = np.asarray(hi(w, 0.6, 3)[:2048, :10313])
    quality("xla high (bf16x3)", xla_high, s_ref)
    quality("plain bf16", bf16, s_ref)
    quality("mask-split bf16x3", it_mask, s_ref)
    quality("convert-split bf16x3", it_conv, s_ref)


if __name__ == "__main__":
    main()
