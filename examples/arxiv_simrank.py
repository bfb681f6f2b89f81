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

    # build P fully on device, scatter-free: for each row tile, mark
    # membership via the vectorised CSR bisection (gathers only), then
    # stitch tiles with dynamic_update_slice.  No multi-GB transfer, no
    # element scatters (both pathological here — see CLAUDE.md).
    from graphtpu.kernels.sampling import edge_exists

    TR = 2048
    inv_deg = (1.0 / jnp.maximum(g.deg, 1).astype(jnp.float32)).astype(
        jnp.bfloat16
    )
    cols = jnp.arange(V_PAD, dtype=jnp.int32)

    @jax.jit
    def p_tile(row0):
        rows = row0 + jnp.arange(TR, dtype=jnp.int32)
        exists = edge_exists(g, rows[:, None], cols[None, :])
        return jnp.where(exists, inv_deg[rows][:, None], jnp.bfloat16(0.0))

    @jax.jit
    def put_tile(pbuf, tile, row0):
        return jax.lax.dynamic_update_slice(pbuf, tile, (row0, 0))

    @jax.jit
    def put_tile_b(pbuf, tile, row0):
        return jax.lax.dynamic_update_slice(pbuf, tile, (row0, 0))

    t0 = time.time()
    p = jnp.zeros((V_PAD, V_PAD), jnp.bfloat16)
    for row0 in range(0, V_PAD, TR):
        p = put_tile(p, p_tile(jnp.int32(row0)), jnp.int32(row0))
    p.block_until_ready()
    print(f"P built on device (bisection tiles): {time.time() - t0:.1f}s", flush=True)

    # device-resident diagonal mask, built from traced row offsets so the
    # client can NEVER constant-fold the [V, V] graph (pathology #2 —
    # input-free or value-independent jits fold for minutes on the host)
    @jax.jit
    def mask_tile(row0):
        rows = row0 + jnp.arange(TR, dtype=jnp.int32)
        return rows[:, None] == cols[None, :]

    t0 = time.time()
    diag = jnp.zeros((V_PAD, V_PAD), bool)
    for row0 in range(0, V_PAD, TR):
        diag = put_tile_b(diag, mask_tile(jnp.int32(row0)), jnp.int32(row0))
    diag.block_until_ready()
    print(f"diag mask built: {time.time() - t0:.1f}s", flush=True)

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
        return jnp.where(diag, jnp.bfloat16(1.0), s2)

    s = jax.jit(lambda d: d.astype(jnp.bfloat16))(diag)
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
    s = jax.jit(lambda x, d: jnp.where(d, jnp.bfloat16(0.0), x))(s, diag)

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
