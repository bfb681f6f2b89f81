"""Exact iterative SimRank — two MXU matmuls per iteration.

The reference computes sim'(i,j) = C/(d_i d_j) * sum_{u in N(i), v in N(j)}
sim(u,v) with a quadruple loop over dense double[V][V] state
(``simrank/SimRank.java:36-77``, STEP=3 iterations, C=0.6, diag pinned to 1
during iteration and zeroed afterwards ``:62-65``; gold standard = 30
iterations per ``benchmark/Test_u_u_TopSim_singleSample.java:17-18``).

In operator form with P = row-stochastic adjacency (P[i,u] = w(i,u) /
sum_u w(i,u)) the update is S' = C * P S P^T — two dense matmuls that map
straight onto the MXU.  Rows of P for degree-0 nodes are zero,
reproducing the reference's "deg==0 -> sim 0" rule (``SimRank.java:69``);
row orientation makes asymmetric weighted graphs follow the reference's
per-node weight semantics.

The weighted variant (``simrank/weighted/WeightedSimRank.java:68-93``,
STEP=50) is the same operator with P[i,u] = w(i,u)/sum_u w(i,u).

For multi-host scale, see :func:`graphtpu.dist.sharded_exact_simrank`:
with S row-sharded over a mesh XLA turns P S P^T into local matmuls plus
ICI collectives.
"""

from __future__ import annotations

import functools
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graphtpu.core.config import SimRankConfig, WeightedSimRankConfig
from graphtpu.core.graph import DiGraph, Graph, dense_adjacency, row_normalized
from graphtpu.kernels.topk import topk_rows


@partial(jax.jit, static_argnames=("iterations", "matmul_precision"))
def _simrank_iterate(
    w: jax.Array,
    c: float,
    iterations: int,
    matmul_precision: str = "highest",
) -> jax.Array:
    """Iterate S' = C * W S W^T with W row-stochastic."""
    v = w.shape[0]
    eye = jnp.eye(v, dtype=w.dtype)

    def body(_, s):
        s = c * (w @ (s @ w.T))
        # pin the diagonal to 1 between iterations (SimRank.java:27-30:
        # sim[i][i] initialised to 1 and never recomputed)
        return s * (1 - eye) + eye

    with jax.default_matmul_precision(matmul_precision):
        s = jax.lax.fori_loop(0, iterations, body, eye)
    # post-process: sim(i,i) = 0 (SimRank.java:62-65)
    return s * (1 - eye)


def exact_simrank(
    g: Graph,
    cfg: SimRankConfig = SimRankConfig(),
    weighted: bool = False,
    dtype=jnp.float32,
    matmul_precision: str = "highest",
) -> jax.Array:
    """Dense [V, V] SimRank scores (diag zeroed).  For V up to ~30k on one
    chip (S is V^2 floats x2 buffers); larger graphs use the sharded path
    in graphtpu.dist or the MC estimators.

    A :class:`DiGraph` gets the standard *directed* SimRank: sim'(i,j) =
    C/(|I(i)||I(j)|) * sum over in-neighbour pairs — the semantics the
    reference's DGraph in-neighbour machinery implies
    (``structures/DGraph.java:91-108``: separate ``ins`` lists with
    ``randInNeighbor``).  That is the same operator with P built from the
    in-CSR."""
    if isinstance(g, DiGraph):
        g = g.in_  # in-neighbour rows: P[i, u] = w(u->i) / sum_in(i)
    a = dense_adjacency(g, dtype=jnp.float32)
    if not weighted and g.weight is not None:
        a = (a > 0).astype(jnp.float32)
    w = row_normalized(a).astype(dtype)
    return _simrank_iterate(w, cfg.c, cfg.iterations, matmul_precision)


def _spmm_mul_stages(v, c, spmv_mode, interpret, eager, unroll=None):
    """Resolve the unroll default OUTSIDE the lru_cache so changing
    ``GRAPHTPU_SPMV_UNROLL`` mid-process gets fresh executables instead
    of silently reusing ones compiled with the old unroll (ADVICE r4)."""
    if unroll is None:
        unroll = int(os.environ.get("GRAPHTPU_SPMV_UNROLL", "1"))
    return _spmm_mul_stages_impl(v, c, spmv_mode, interpret, eager, unroll)


@functools.lru_cache(maxsize=16)
def _spmm_mul_stages_impl(v, c, spmv_mode, interpret, eager, unroll):
    """The two streaming-product executables (mode-specific); separate
    cache from the elementwise stages so kahan/fast/fast16 share the
    transposes, init and finish executables (compile budget per chip
    session is scarce — see CLAUDE.md)."""
    from graphtpu.kernels.spmm import spmv_pallas_flat

    maybe_jit = (lambda f: f) if eager else jax.jit

    @maybe_jit
    def mul_flat(p, x_flat):
        # ((v+1)*v,) out; row v is the pad-item dummy row, never read
        # back (all stream slots < v)
        return spmv_pallas_flat(
            p, x_flat, v, mode=spmv_mode, interpret=interpret,
            unroll=unroll,
        )

    @maybe_jit
    def mul_pin_flat(p, out_flat):
        # first product of an iteration, consuming the PREVIOUS
        # iteration's raw output: the where(diag, 1, c*S) table
        # transform runs inside the kernel's row gathers (table_scale),
        # deleting the iterate-sized scale_pin read+write pass
        return spmv_pallas_flat(
            p, out_flat, v, mode=spmv_mode, interpret=interpret,
            table_scale=c, unroll=unroll,
        )

    return mul_flat, mul_pin_flat


@functools.lru_cache(maxsize=8)
def _spmm_stages(v, v_real, c, interpret, dtype, eager):
    """Stage executables for the streaming SimRank loop, CACHED across
    ``exact_simrank_spmm`` calls.

    Round-4 lesson: defining these jits inside the driver meant every
    call re-created fresh jit objects, so "warm" timings re-lowered and
    re-requested remote compiles for seven executables per call — the
    742 ms (arxiv) / 1674 ms (blog) "per-iteration" numbers were mostly
    compile machinery (the kernels themselves run 70-80 ms/product and
    the transposes 34-133 ms; tools/exp_spmv_rate.py).

    S stays a FLAT (row-major) 1-D array between stages, each stage its
    own donated jit — flat operands skip the tiled->linear relayout XLA
    inserts at the pallas boundary, and donation caps every stage at TWO
    live iterate-sized buffers.  NO donation on the muls: x is the
    kernel's random-access TABLE.
    """
    maybe_jit = (lambda f: f) if eager else jax.jit

    tp_b = min(v, 4096)
    n_full, tp_rem = divmod(v, tp_b)

    # ONE-dispatch XLA transpose: flat -> one tiled [v, v] reshape temp,
    # then each COLUMN panel transposes + flattens straight into the
    # output, padded to the ((v+1)*v,) mul shape so XLA aliases it onto
    # the donated input (peak = 2 iterates, AOT-verified).
    @partial(jax.jit, donate_argnums=(0,))
    def transpose_onejit(ps):
        x2 = ps[: v * v].reshape(v, v)
        parts = []
        for i in range(n_full + (1 if tp_rem else 0)):
            b = tp_b if i < n_full else tp_rem
            lo = i * tp_b
            parts.append(x2[:, lo : lo + b].T.reshape(-1))
        parts.append(jnp.zeros((v,), dtype))
        return jnp.concatenate(parts)

    # (A pallas tiled flat transpose was adjudicated OUT in round 5:
    # statistical tie with the onejit at the blog f32 shape, 33.6 vs
    # 33.7 ms, and Mosaic rejects its 2-D->1-D vector reshape at bf16 —
    # the onejit won by default at the arxiv bf16 shape, 79 ms.)

    # Elementwise stages stay 1-D: the diagonal of a row-major [v, v]
    # lives at flat indices ≡ 0 (mod v+1), so no flat->2-D reshape is
    # ever needed.
    @maybe_jit
    def scale_pin_flat(out_flat):
        # c * out, diag pinned to 1 (SimRank.java:27-30); trims the
        # dummy row; runs ONCE per call (the in-loop form is fused into
        # mul_pin_flat)
        s2 = out_flat[: v * v]
        i = jax.lax.iota(jnp.int32, v * v)
        return jnp.where(i % (v + 1) == 0, 1.0, c * s2).astype(dtype)

    @maybe_jit
    def init_flat(one):
        # ``one`` is a traced scalar: a jit whose output depends only on
        # constants folds the 1.5e9-element iota client-side (minutes of
        # CPU; see CLAUDE.md).  Output padded to ((v+1)*v,) — the same
        # signature the transpose stages emit — so mul_flat compiles
        # ONCE per (v, mode), not twice (ADVICE r4: each extra signature
        # costs a remote compile against the ~10/session budget).
        i = jax.lax.iota(jnp.int32, (v + 1) * v)
        diag = (i % (v + 1) == 0) & (i < v * v)
        return jnp.where(diag, one, 0.0).astype(dtype)

    @partial(jax.jit, donate_argnums=(0,))
    def zero_diag_flat(s_flat):
        i = jax.lax.iota(jnp.int32, v * v)
        return jnp.where(i % (v + 1) == 0, 0.0, s_flat)

    def _out_panel_fn(b):
        @partial(jax.jit, donate_argnums=(0,))
        def panel(out2d, s_flat, lo):
            p = jax.lax.dynamic_slice(s_flat, (lo * v,), (b * v,))
            return jax.lax.dynamic_update_slice(
                out2d, p.reshape(b, v)[:, :v_real], (lo, jnp.int32(0))
            )

        return panel

    fp_b = min(v_real, tp_b)
    nf, rem = divmod(v_real, fp_b)
    return {
        "transpose_onejit": transpose_onejit,
        "scale_pin_flat": scale_pin_flat,
        "init_flat": init_flat,
        "zero_diag_flat": zero_diag_flat,
        "out_panel_full": _out_panel_fn(fp_b),
        "out_panel_rem": _out_panel_fn(rem) if rem else None,
        "tp_b": tp_b,
        "n_full": n_full,
        "tp_rem": tp_rem,
        "fp_b": fp_b,
        "nf": nf,
        "rem": rem,
    }


def exact_simrank_spmm(
    g: Graph,
    cfg: SimRankConfig = SimRankConfig(),
    weighted: bool = False,
    dtype=jnp.float32,
    width: int = 8,
    col_block: int = 4096,
    impl: str = "auto",
    spmv_mode: str = "kahan",
    interpret: bool = False,
    spmv_seg: Optional[int] = None,
) -> jax.Array:
    """Exact SimRank with SPARSE P·S / (P·Sᵀ) products (diag zeroed).

    Same fixed point as :func:`exact_simrank` — S' = C·P·S·Pᵀ, diag pinned
    during iteration (``simrank/SimRank.java:36-77``) — but each product
    runs as a gather-reduction-tree SpMM (:mod:`graphtpu.kernels.spmm`)
    costing ~(1+pad)·E·V reads instead of V³ MXU FLOPs, with EXACT f32
    tree sums (no bf16 rounding, no cumsum cancellation).  The win grows
    with sparsity: dense is compute-bound at V³/peak-FLOPs, this is
    bandwidth-bound at E·V/HBM-BW — faster whenever V²/E exceeds the
    chip's FLOP:byte balance point.

    S is O(V²) dense state either way (SimRank's output is all-pairs);
    a :class:`DiGraph` uses in-neighbour rows as in :func:`exact_simrank`.
    On TPU the products run as ONE streaming Pallas pass each (exactly
    E + V row DMAs, Kahan row sums); off-TPU an XLA gather-tree runs.
    S is symmetric, so ``P·(P·S)ᵀ == (P·S·Pᵀ)ᵀ == P·S·Pᵀ`` — each
    iteration spends one transpose, not two.
    """
    from graphtpu.core.graph import pad_graph_nodes
    from graphtpu.kernels.spmm import (
        build_reduction_tree,
        build_spmv_stream,
        spmv_pallas_flat,
        tree_spmm,
    )

    if isinstance(g, DiGraph):
        g = g.in_
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    v_real = g.n_nodes
    if impl == "pallas":
        # streaming kernel needs 1024-aligned row length; isolated pad
        # nodes leave real scores untouched
        v = -(-v_real // 1024) * 1024
        g = pad_graph_nodes(g, v)
        # spmv_seg=k (or GRAPHTPU_SPMV_SEG=k): coalesced k-row-DMA
        # streams (pair with a core.reorder relabeling for the
        # adjacent-slot fraction)
        seg = (
            spmv_seg
            if spmv_seg is not None
            else int(os.environ.get("GRAPHTPU_SPMV_SEG", "1"))
        )
        if seg > 1:
            from graphtpu.kernels.spmm import build_spmv_segments

            plan = build_spmv_segments(g, weighted=weighted, k=seg)
        else:
            plan = build_spmv_stream(g, weighted=weighted)

        eager = bool(os.environ.get("GRAPHTPU_EAGER"))
        assert v * v < 2**31, "flat int32 iota overflow; shard instead"
        st = _spmm_stages(v, v_real, cfg.c, interpret, dtype, eager)

        # GRAPHTPU_HARD_SYNC=1: drain the async queue after every stage
        # with a 1-element readback.  Under the remote runtime
        # block_until_ready can return before execution; a Python loop
        # running ahead pre-allocates every queued stage's output and a
        # worker pushed over HBM this way hangs instead of erroring
        # (DESIGN.md "O(V²) iterates under a hard HBM ceiling").
        if os.environ.get("GRAPHTPU_HARD_SYNC"):
            def _sync(x):
                float(x.reshape(-1)[0])
        else:
            def _sync(x):
                pass

        mul_flat, mul_pin_flat = _spmm_mul_stages(
            v, cfg.c, spmv_mode, interpret, eager
        )
        scale_pin_flat = st["scale_pin_flat"]
        tp_stage = st["transpose_onejit"]
        tp_b, n_full, tp_rem = st["tp_b"], st["n_full"], st["tp_rem"]

        if os.environ.get("GRAPHTPU_SPMM_PROFILE"):
            # per-stage wall times (forces a readback after each stage);
            # diagnostic only — the readbacks serialise the async queue
            import time as _time

            _prof: dict = {}

            def _stage_wrap(name, f):
                def wrapped(*a):
                    t0 = _time.time()
                    r = f(*a)
                    float(r.reshape(-1)[0])
                    _prof[name] = (
                        _prof.get(name, 0.0) + _time.time() - t0
                    )
                    return r

                return wrapped

            mul_flat = _stage_wrap("mul", mul_flat)
            mul_pin_flat = _stage_wrap("mul_pin", mul_pin_flat)
            scale_pin_flat = _stage_wrap("scale_pin", scale_pin_flat)
            tp_stage = _stage_wrap("transpose", tp_stage)

        def transpose_flat_of(box):
            # takes OWNERSHIP of ps via a 1-element list so the caller
            # holds no reference during the transpose (a caller-held ps
            # would make three iterate-sized buffers live); all forms
            # keep peak live memory ~2 iterate-sized buffers
            ps = box.pop()
            if not eager:
                pst = tp_stage(ps)
                del ps
                _sync(pst)
                return pst
            # eager DUS cannot run in place (no donation), so build
            # the column blocks of psT as separate parts and
            # concatenate: parts total one iterate while ps lives
            parts = []
            for i in range(n_full + (1 if tp_rem else 0)):
                b = tp_b if i < n_full else tp_rem
                seg = jax.lax.dynamic_slice(ps, (i * tp_b * v,), (b * v,))
                parts.append(seg.reshape(b, v).T)  # [v, b]
                _sync(parts[-1])
            del ps
            out2d = jnp.concatenate(parts, axis=1)
            _sync(out2d)
            del parts
            pst = jnp.concatenate(
                [out2d.reshape(-1), jnp.zeros((v,), dtype)]
            )
            _sync(pst)
            return pst

        s = st["init_flat"](jnp.float32(1.0))
        _sync(s)
        for k in range(cfg.iterations):
            # k == 0: table is the materialised identity; k > 0: table is
            # the previous iteration's RAW output and the scale+diag-pin
            # runs inside the kernel's gathers — no iterate-sized
            # elementwise pass in the loop
            ps = (mul_flat if k == 0 else mul_pin_flat)(plan, s)   # P S'
            _sync(ps)
            del s                                  # keep <= 2 iterates live
            box = [ps]
            del ps                                 # box holds the only ref
            pst = transpose_flat_of(box)
            out = mul_flat(plan, pst)              # P (P S')^T == P S' P^T
            _sync(out)
            del pst
            s = out                                # raw (pre-scale), v+1 rows
            del out
        s = scale_pin_flat(s)                      # materialise S' once
        _sync(s)
        if os.environ.get("GRAPHTPU_SPMM_PROFILE"):
            print(f"[spmm profile] { {k: round(x, 3) for k, x in _prof.items()} }",
                  flush=True)
        # post-process: sim(i,i) = 0 (SimRank.java:62-65), trim pad rows.
        # NOT one reshape+slice jit: a flat->2-D reshape XLA cannot fuse
        # materialises a full tiled [v, v] temp even when the consumer is
        # a thin slice (measured above), so that form peaks at ~3
        # iterate-sized buffers and a worker pushed over HBM hangs rather
        # than erroring (ADVICE r3).  Instead: diag-zero in place on the
        # donated flat buffer, then emit rows as 2-D panels into the
        # [v_real, v_real] result — peak ~2 iterates + one panel.
        s = st["zero_diag_flat"](s)
        _sync(s)
        fp_b = st["fp_b"]
        nf, rem = st["nf"], st["rem"]
        if eager:
            # eager DUS cannot run in place; concatenate row panels
            parts = []
            for i in range(nf + (1 if rem else 0)):
                b = fp_b if i < nf else rem
                seg = jax.lax.dynamic_slice(s, (i * fp_b * v,), (b * v,))
                parts.append(seg.reshape(b, v)[:, :v_real])
                _sync(parts[-1])
            del s
            out2d = jnp.concatenate(parts, axis=0)
        else:
            out2d = jnp.zeros((v_real, v_real), dtype)
            for i in range(nf):
                out2d = st["out_panel_full"](out2d, s, jnp.int32(i * fp_b))
                _sync(out2d)
            if rem:
                out2d = st["out_panel_rem"](
                    out2d, s, jnp.int32(nf * fp_b)
                )
            del s
        return out2d

    v = v_real
    plan = build_reduction_tree(g, width=width, weighted=weighted)

    def mul(p, x):
        return tree_spmm(p, x, col_block=col_block, impl="xla")

    @partial(jax.jit, donate_argnums=(1,))
    def one_iter(plan, s, diag_idx):
        ps = mul(plan, s)            # P S
        out = cfg.c * mul(plan, ps.T)  # c * P (P S)^T == c * P S P^T (S sym)
        # pin the diagonal to 1 between iterations (SimRank.java:27-30)
        cols = jax.lax.broadcasted_iota(jnp.int32, (v, v), 1)
        return jnp.where(cols == diag_idx[:, None], 1.0, out).astype(dtype)

    @jax.jit
    def init(diag_idx):
        cols = jax.lax.broadcasted_iota(jnp.int32, (v, v), 1)
        return (cols == diag_idx[:, None]).astype(dtype)

    diag_idx = jnp.arange(v, dtype=jnp.int32)
    s = init(diag_idx)
    for _ in range(cfg.iterations):
        s = one_iter(plan, s, diag_idx)
    # post-process: sim(i,i) = 0 (SimRank.java:62-65), trim pad nodes
    @partial(jax.jit, donate_argnums=(0,))
    def finish(s, diag_idx):
        cols = jax.lax.broadcasted_iota(jnp.int32, (v, v), 1)
        return jnp.where(cols == diag_idx[:, None], 0.0, s)[:v_real, :v_real]

    return finish(s, diag_idx)


def weighted_simrank(
    g: Graph,
    cfg: WeightedSimRankConfig = WeightedSimRankConfig(),
    **kw,
) -> jax.Array:
    return exact_simrank(
        g, SimRankConfig(c=cfg.c, iterations=cfg.iterations, topk=cfg.topk),
        weighted=True, **kw,
    )


def simrank_topk(
    sim: jax.Array, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row descending top-k (values, indices) — the Print.printByOrder
    extraction (diag already zeroed)."""
    vals, idx = topk_rows(sim, k)
    return np.asarray(vals), np.asarray(idx)


def weighted_simrank_reference_oracle(
    g: Graph, c: float, iterations: int
) -> np.ndarray:
    """Literal numpy port of WeightedSimRank.java:68-93:
    sim'(i,j) = C * sum_{u,v} w(i,u) w(j,v) sim(u,v) / (sum w(i,.) sum w(j,.))
    """
    vcount = g.n_nodes
    rp, col = np.asarray(g.row_ptr), np.asarray(g.col)
    w = (
        np.ones_like(col, np.float64)
        if g.weight is None
        else np.asarray(g.weight, np.float64)
    )
    sim = np.eye(vcount)
    wsum = np.array([w[rp[i] : rp[i + 1]].sum() for i in range(vcount)])
    for _ in range(iterations):
        new = np.eye(vcount)
        for i in range(vcount):
            for j in range(i + 1, vcount):
                if wsum[i] == 0 or wsum[j] == 0:
                    new[i, j] = new[j, i] = 0.0
                    continue
                ni, wi = col[rp[i] : rp[i + 1]], w[rp[i] : rp[i + 1]]
                nj, wj = col[rp[j] : rp[j + 1]], w[rp[j] : rp[j + 1]]
                val = c * (wi[:, None] * wj[None, :] * sim[np.ix_(ni, nj)]).sum()
                new[i, j] = new[j, i] = val / (wsum[i] * wsum[j])
        sim = new
    np.fill_diagonal(sim, 0.0)
    return sim


def directed_simrank_reference_oracle(
    g: DiGraph, c: float, iterations: int
) -> np.ndarray:
    """Directed SimRank oracle (float64 quadruple loop over in-neighbours):
    sim'(i,j) = C/(|I(i)||I(j)|) * sum_{u in I(i), v in I(j)} sim(u,v),
    the semantics implied by DGraph's ``ins`` lists
    (``structures/DGraph.java:91-108``)."""
    gin = g.in_
    vcount = gin.n_nodes
    rp, col = np.asarray(gin.row_ptr), np.asarray(gin.col)
    deg = np.asarray(gin.deg)
    sim = np.eye(vcount)
    for _ in range(iterations):
        new = np.eye(vcount)
        for i in range(vcount):
            for j in range(i + 1, vcount):
                if deg[i] == 0 or deg[j] == 0:
                    new[i, j] = new[j, i] = 0.0
                    continue
                ni = col[rp[i] : rp[i + 1]]
                nj = col[rp[j] : rp[j + 1]]
                val = c * sim[np.ix_(ni, nj)].sum() / (deg[i] * deg[j])
                new[i, j] = new[j, i] = val
        sim = new
    np.fill_diagonal(sim, 0.0)
    return sim


def exact_simrank_reference_oracle(
    g: Graph, c: float, iterations: int
) -> np.ndarray:
    """Literal numpy port of the SimRank.java quadruple loop — the parity
    oracle for tests (float64, O(V^2 d^2), tiny graphs only)."""
    vcount = g.n_nodes
    rp, col = np.asarray(g.row_ptr), np.asarray(g.col)
    deg = np.asarray(g.deg)
    sim = np.eye(vcount)
    for _ in range(iterations):
        new = np.eye(vcount)
        for i in range(vcount):
            for j in range(i + 1, vcount):
                if deg[i] == 0 or deg[j] == 0:
                    new[i, j] = new[j, i] = 0.0
                    continue
                ni = col[rp[i] : rp[i + 1]]
                nj = col[rp[j] : rp[j + 1]]
                val = c * sim[np.ix_(ni, nj)].sum() / (deg[i] * deg[j])
                new[i, j] = new[j, i] = val
        sim = new
    np.fill_diagonal(sim, 0.0)
    return sim
