"""Exact SimRank on arxiv (V=38,741) — beyond the reference's reach.

STATUS (round 1): work in progress.  The [V, V] bf16 matmul itself is
proven fast at this scale (a bare 38912^3 bf16 dot compiles+runs in 1.6s
on the chip), but three remote-backend pathologies block the full loop so
far and are documented in CLAUDE.md: (1) element-wise scatters into
multi-GB arrays effectively hang, (2) jit functions with no traced inputs
constant-fold huge iota/where graphs on the client, (3) host->device
transfer of the 3GB operand runs at ~11MB/s.  Round 2: build P on device
scatter-free (tiled compare against padded neighbour rows) and feed the
iteration entirely from device-resident state.

The reference runs exact SimRank only up to ~10k vertices (dense
double[V][V] on one JVM, ``SURVEY.md §6``); on arxiv it falls back to MC
approximations.  One TPU chip holds the dense problem in bf16: V padded
to 38,912 gives 2.9GB per [V, V] buffer; S' = C P S P^T runs on the MXU
with f32 accumulation.  The adjacency is densified on device from the
CSR (the host->device link is the bottleneck, so only the edge list is
transferred).

Validation: top-k agreement against an independent UniWalk MC estimate on
a source subset (the estimators agree at the same level they do on small
graphs where exact-f32 is available).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import graphtpu
from graphtpu.core.config import UniWalkConfig
from graphtpu.kernels.topk import topk_rows
from graphtpu.simrank.uniwalk import uniwalk_simrank

ARXIV = "/root/reference/DeepSim/lshrank_data/realdata/arxiv_author_pub.txt"
V_PAD = 38912  # 304 * 128


def main(iterations=5, c=0.6, topk=20, n_check=128):
    g = graphtpu.read_edgelist_graph(ARXIV, n_nodes=V_PAD)
    print(f"graph: V={g.n_nodes} slots={g.n_edges} maxdeg={g.max_degree}", flush=True)

    # build P host-side in bf16 and ship it once: device scatters of
    # individual elements are pathological on this backend (CLAUDE.md)
    t0 = time.time()
    import ml_dtypes

    deg = np.asarray(g.deg)
    src_np = np.repeat(np.arange(V_PAD), deg)
    p_host = np.zeros((V_PAD, V_PAD), dtype=ml_dtypes.bfloat16)
    p_host[src_np, np.asarray(g.col)] = (
        1.0 / np.maximum(deg[src_np], 1)
    ).astype(ml_dtypes.bfloat16)
    print(f"P built on host: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    p = jnp.asarray(p_host)
    p.block_until_ready()
    del p_host
    print(f"P transferred: {time.time() - t0:.1f}s", flush=True)

    def pin_diag(x, val):
        # fused iota-compare select: single-element scatters into multi-GB
        # arrays are pathologically slow on this backend (CLAUDE.md)
        r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(r == col, jnp.bfloat16(val), x)

    @jax.jit
    def one_iter(s):
        # MXU accumulates f32 internally; bf16 preferred output avoids any
        # full-size f32 buffer (HBM holds only bf16 [V, V] arrays)
        t = jax.lax.dot_general(
            s, p, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )  # s @ p.T
        s2 = jnp.bfloat16(c) * jax.lax.dot(
            p, t, preferred_element_type=jnp.bfloat16
        )
        return pin_diag(s2, 1.0)

    @jax.jit
    def init_s():
        return pin_diag(jnp.zeros((V_PAD, V_PAD), jnp.bfloat16), 1.0)

    s = init_s()
    t0 = time.time()
    s = one_iter(s)
    s.block_until_ready()
    print(f"iter 1 (compile): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(iterations - 1):
        s = one_iter(s)
    s.block_until_ready()
    per = (time.time() - t0) / max(iterations - 1, 1)
    print(f"per-iter: {per:.2f}s ({2 * 2 * V_PAD**3 / per / 1e12:.1f} Tflop/s eff)", flush=True)
    s = jax.jit(lambda x: pin_diag(x, 0.0))(s)

    # top-k for a check subset + validation vs UniWalk MC
    rows = s[:n_check].astype(jnp.float32)
    vals, idx = topk_rows(rows, topk)
    uw_vals, uw_idx = uniwalk_simrank(
        g,
        UniWalkConfig(sample=3000, step=iterations, topk=topk, source_tile=64),
        key=jax.random.key(0),
        sources=np.arange(n_check),
    )
    agree = []
    for r in range(n_check):
        a = set(np.asarray(idx)[r][np.asarray(vals)[r] > 0].tolist())
        b = set(uw_idx[r][uw_vals[r] > 0].tolist())
        if a:
            agree.append(len(a & b) / len(a))
    print(f"exact(bf16) vs uniwalk top-{topk} agreement on {n_check} sources: "
          f"{np.mean(agree):.3f}", flush=True)
    np.save("/tmp/arxiv_top20_idx.npy", np.asarray(idx))
    print("OK", flush=True)


if __name__ == "__main__":
    main()
