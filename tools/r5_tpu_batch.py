"""Round-5 one-process chip session (CLAUDE.md: pack a session's work
into ONE process):

  1. BlogCatalog micro-F1 revalidation on the CURRENT stack at the
     reference budget (VERDICT r4 #5): 10 x 80 walks, d=128, window 10,
     10 epochs, p=q=0.25, TopKRanker protocol, 3 shuffles x {10,50,90}%.
  2. fast16 parity at arxiv (top-20 agreement vs kahan) + the V-range
     demo: dense-state streaming SimRank at a V whose f32 iterates
     cannot fit one chip but bf16 can (VERDICT r4 #8).
  3. Parked-kernel adjudication (VERDICT r4 #6): pallas tiled transpose
     vs the XLA onejit at arxiv; segsum_pallas vs the production
     sort+cumsum path at the blog shape.

Each part is fault-isolated; results append to results/r5_batch.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BLOG_EDGES = "/root/reference/DeepSim/lshrank_data/realdata/blog.txt"
BLOG_MAT = "/root/reference/node2vec/src/blogcatalog.mat"
ARXIV = "/root/reference/DeepSim/lshrank_data/realdata/arxiv_author_pub.txt"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "results", "r5_batch.json",
)

RES = {}


def save(k, v):
    RES[k] = v
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(f"[batch] {k}: {json.dumps(v)}", flush=True)


def part_f1():
    import jax

    import graphtpu
    from graphtpu.core.config import SGNSConfig, WalkConfig
    from graphtpu.eval.f1 import topk_ranker_scoring
    from graphtpu.io.matfile import labels_to_lists, load_blogcatalog
    from graphtpu.pipelines import node2vec_pipeline

    g = graphtpu.read_edgelist_graph(BLOG_EDGES, n_nodes=10313)
    t0 = time.time()
    emb = node2vec_pipeline(
        g,
        walk_cfg=WalkConfig(num_walks=10, walk_length=80, p=0.25, q=0.25),
        sgns_cfg=SGNSConfig(dim=128, window=10, epochs=10),
        seed=0,
    )
    train_s = time.time() - t0
    print(f"[f1] pipeline: {train_s:.1f}s", flush=True)
    _, group = load_blogcatalog(BLOG_MAT)
    labels = labels_to_lists(group)
    n = group.shape[0]
    feats = emb[1 : n + 1]  # mat row i -> graph id i+1 (classify.py:192)
    res = topk_ranker_scoring(
        feats, labels, group.shape[1],
        train_fractions=[0.1, 0.5, 0.9], n_shuffles=3, verbose=True,
    )
    save("blogcatalog_f1", {
        "train_s": round(train_s, 1),
        **{
            str(k): round(float(np.mean([r["micro"] for r in v])), 4)
            for k, v in res.items()
        },
        "macro": {
            str(k): round(float(np.mean([r["macro"] for r in v])), 4)
            for k, v in res.items()
        },
    })


def part_spmm(fits):
    """The composed streaming-SpMM numbers (VERDICT r4 #1), probed as a
    CAUTIOUS LADDER: read the graph + run the blog suite BEFORE any
    multi-GB probe (a failed big allocation corrupts every later
    allocation in the process — round-5), then probe up to arxiv.
    ``fits(gib)`` is the caller's probe closure."""
    import jax.numpy as jnp

    import graphtpu
    from graphtpu.core.reorder import rcm_order, relabel_graph
    from bench import _spmm_suite

    out = dict(RES.get("spmm_composed", {}))
    blog_done = "spmm_blog_fast_ms_per_iter" in out
    blog_g = (
        graphtpu.read_edgelist_graph(BLOG_EDGES, n_nodes=10496)
        if os.path.exists(BLOG_EDGES) else None
    )
    mid = fits(1.2)   # blog composed loop peaks ~2.2 GB
    print(f"[batch] spmm mid tier (1.2 GiB x2): {mid}", flush=True)
    if blog_done:
        print("[batch] blog suite already measured; arxiv only",
              flush=True)
    elif blog_g is not None and mid:
        out.update(_spmm_suite(blog_g, "blog", [
            ("fast", "fast", jnp.float32, 4.0, 1),
        ]))
        try:
            g2, _ = relabel_graph(blog_g, rcm_order(blog_g))
            out.update(_spmm_suite(g2, "blog", [
                ("fast_seg2", "fast", jnp.float32, 4.0, 2),
            ]))
        except Exception as e:
            print(f"[batch] blog seg2 failed {e!r}", flush=True)
    elif blog_g is not None:
        moreno = ("/root/reference/DeepSim/lshrank_data/realdata/"
                  "moreno_crime_crime.txt")
        if os.path.exists(moreno):
            try:
                gm = graphtpu.read_edgelist_graph(moreno)
                out.update(_spmm_suite(gm, "moreno", [
                    ("fast", "fast", jnp.float32, 4.0, 1),
                ]))
            except Exception as e:
                print(f"[batch] moreno failed {e!r}", flush=True)
    if out:
        save("spmm_composed", dict(out))
    if mid and fits(5.7) and os.path.exists(ARXIV):
        ga = graphtpu.read_edgelist_graph(ARXIV, n_nodes=38912)
        out.update(_spmm_suite(ga, "arxiv", [
            ("kahan", "kahan", jnp.float32, 4.0, 1),
            ("fast", "fast", jnp.float32, 4.0, 1),
            ("fast16", "fast", jnp.bfloat16, 2.0, 1),
        ]))
        save("spmm_composed", dict(out))
        try:
            ga2, _ = relabel_graph(ga, rcm_order(ga))
            out.update(_spmm_suite(ga2, "arxiv", [
                ("fast_seg2", "fast", jnp.float32, 4.0, 2),
            ]))
        except Exception as e:
            print(f"[batch] arxiv seg2 failed {e!r}", flush=True)
        save("spmm_composed", dict(out))
    if not out:
        print("[batch] spmm suite produced nothing", flush=True)


def part_fast16(hbm_full):
    import jax
    import jax.numpy as jnp

    import graphtpu
    from graphtpu.core.config import SimRankConfig
    from graphtpu.simrank.exact import exact_simrank_spmm

    if hbm_full and os.path.exists(ARXIV):
        g = graphtpu.read_edgelist_graph(ARXIV, n_nodes=38912)
        t0 = time.time()
        s_k = exact_simrank_spmm(g, SimRankConfig(iterations=3),
                                 spmv_mode="kahan")
        vk, ik = jax.jit(lambda s: jax.lax.top_k(s[:512], 20))(s_k)
        ik = np.asarray(ik)
        del s_k, vk
        print(f"[fast16] kahan 3 iters: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        s_f = exact_simrank_spmm(g, SimRankConfig(iterations=3),
                                 spmv_mode="fast", dtype=jnp.bfloat16)
        vf, if_ = jax.jit(
            lambda s: jax.lax.top_k(s[:512].astype(jnp.float32), 20)
        )(s_f)
        if_ = np.asarray(if_)
        del s_f, vf
        print(f"[fast16] fast16 3 iters: {time.time()-t0:.1f}s", flush=True)
        agree = np.mean([
            len(set(ik[r]) & set(if_[r])) / 20 for r in range(512)
        ])
        save("fast16_arxiv_top20_agreement", round(float(agree), 4))
        del g

    # V-range demo: V=45000 -> padded 45056; two f32 iterates = 16.2 GB
    # (over one v5e's HBM), two bf16 iterates = 8.1 GB (fits).
    v = 45_000
    rng = np.random.default_rng(3)
    e = 8 * v
    edges = rng.integers(0, v, size=(e, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    ring = np.stack([np.arange(v), (np.arange(v) + 1) % v], 1)
    g = graphtpu.build_graph(np.concatenate([edges, ring]), n_nodes=v)
    iters = 3
    t0 = time.time()
    s = exact_simrank_spmm(g, SimRankConfig(iterations=iters),
                           spmv_mode="fast", dtype=jnp.bfloat16)
    vals, idx = jax.jit(
        lambda s: jax.lax.top_k(s[:256].astype(jnp.float32), 20)
    )(s)
    vals = np.asarray(vals)
    wall = time.time() - t0
    del s, idx
    save("fast16_vrange_demo", {
        "V": v, "iters": iters, "wall_s": round(wall, 1),
        "per_iter_est_s": round(wall / iters, 1),
        "top1_mean": round(float(vals[:, 0].mean()), 5),
        "note": "f32 iterates (2x8.1GB) exceed one v5e HBM; bf16 runs",
    })


def part_arxiv16(fits):
    """Round-5 session-2: the arxiv composed number the pool CAN hold.

    Measured ceiling after recycling all four workers (ladder probe):
    ~10.4-11.0 GiB free pool-wide — the remaining ~5 GB is the four
    workers' baseline reservations, so the arxiv f32 suite (two 6.06 GB
    iterates + transpose scratch ≈ 12.1+ GB) is STRUCTURALLY infeasible
    on the shared pool, not leak-blocked.  What fits is fast16: bf16
    iterates are 3.03 GB, peak ~3 iterate buffers ≈ 9.1 GB.  This part
    delivers (a) the composed arxiv fast16 per-iteration number
    (VERDICT r4 #1 at target scale, reduced precision), (b) the
    transpose adjudication at the SAME bf16 arxiv stage set (VERDICT r4
    #6 — shares the suite's compiles via the _spmm_stages lru_cache),
    and (c) the V-range demo in its honest form: the reference's own
    arxiv dataset cannot run f32 on this pool but runs bf16
    (VERDICT r4 #8)."""
    import jax
    import jax.numpy as jnp

    import graphtpu
    from bench import _spmm_suite

    if not (fits(3.2) and os.path.exists(ARXIV)):
        print("[batch] arxiv16 skipped: needs ~6.4 GiB free", flush=True)
        return
    ga = graphtpu.read_edgelist_graph(ARXIV, n_nodes=38912)
    out = dict(RES.get("spmm_composed", {}))
    out.update(_spmm_suite(ga, "arxiv", [
        ("fast16", "fast", jnp.bfloat16, 2.0, 1),
    ]))
    save("spmm_composed", dict(out))
    if "spmm_arxiv_fast16_ms_per_iter" in out:
        per = out["spmm_arxiv_fast16_ms_per_iter"]
        save("fast16_vrange_demo", {
            "V": 38912, "dataset": "arxiv",
            "per_iter_ms": per,
            "note": ("arxiv f32 iterates (2x6.06 GB + transpose scratch)"
                     " exceed the shared pool's measured ~10.4-11.0 GiB"
                     " free ceiling (ladder probe after recycling all 4"
                     " workers); bf16 runs — fast16 doubles the V range"
                     " on this pool"),
        })
    # transpose timing at the bf16 arxiv iterate shape (the pallas
    # candidate was adjudicated OUT: blog-f32 tie + Mosaic rejects its
    # 2-D->1-D vector reshape at bf16; results/r5_batch.json)
    from graphtpu.simrank.exact import _spmm_stages
    v = 38912
    st = _spmm_stages(v, v, 0.6, False, jnp.bfloat16, False)
    res = {}
    for tag in ("transpose_onejit",):
        try:
            fn = st[tag]
            x = jnp.zeros(((v + 1) * v,), jnp.bfloat16) + 1.0
            y = fn(x)
            jax.block_until_ready(y)
            del x, y
            best = 1e9
            for _ in range(3):
                x2 = jnp.zeros(((v + 1) * v,), jnp.bfloat16) + 1.0
                jax.block_until_ready(x2)
                t0 = time.time()
                y = fn(x2)
                jax.block_until_ready(y)
                best = min(best, time.time() - t0)
                del x2, y
            res[tag] = round(best * 1e3, 1)
            print(f"[tp16] {tag}: {best*1e3:.1f} ms", flush=True)
        except Exception as e:
            res[tag] = f"failed: {e!r}"
            print(f"[tp16] {tag} failed: {e!r}", flush=True)
    save("transpose_ms_v38912_bf16", res)


def part_parity16():
    """fast16 top-20 parity vs the kahan f32 path at blog scale (the
    largest V whose f32 suite fits the pool) — closes VERDICT r4 #8's
    parity clause with a same-dataset agreement number."""
    import jax
    import jax.numpy as jnp

    import graphtpu
    from graphtpu.core.config import SimRankConfig
    from graphtpu.simrank.exact import exact_simrank_spmm

    g = graphtpu.read_edgelist_graph(BLOG_EDGES, n_nodes=10496)
    t0 = time.time()
    s_k = exact_simrank_spmm(g, SimRankConfig(iterations=5),
                             spmv_mode="kahan")
    vk, ik = jax.jit(lambda s: jax.lax.top_k(s[:512], 20))(s_k)
    ik = np.asarray(ik)
    del s_k, vk
    print(f"[parity16] kahan 5 iters: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    s_f = exact_simrank_spmm(g, SimRankConfig(iterations=5),
                             spmv_mode="fast", dtype=jnp.bfloat16)
    vf, if_ = jax.jit(
        lambda s: jax.lax.top_k(s[:512].astype(jnp.float32), 20)
    )(s_f)
    if_ = np.asarray(if_)
    del s_f, vf
    print(f"[parity16] fast16 5 iters: {time.time()-t0:.1f}s", flush=True)
    agree = np.mean([
        len(set(ik[r]) & set(if_[r])) / 20 for r in range(512)
    ])
    save("fast16_blog_top20_agreement", round(float(agree), 4))


def part_transpose(v):
    """Time the (sole, post-adjudication) onejit flat transpose at
    iterate shape ``v`` (blog 11264 on mid-tier members, arxiv 38912 on
    full-tier)."""
    import jax
    import jax.numpy as jnp

    from graphtpu.simrank.exact import _spmm_stages
    st = _spmm_stages(v, v, 0.6, False, jnp.float32, False)
    out = {}
    for tag in ("transpose_onejit",):
        try:
            fn = st[tag]
            # onejit donates its input; rebuild x for every call
            x = jnp.zeros(((v + 1) * v,), jnp.float32) + 1.0
            y = fn(x)
            jax.block_until_ready(y)
            del x, y
            best = 1e9
            for _ in range(3):
                x2 = jnp.zeros(((v + 1) * v,), jnp.float32) + 1.0
                jax.block_until_ready(x2)
                t0 = time.time()
                y = fn(x2)
                jax.block_until_ready(y)
                best = min(best, time.time() - t0)
                del x2, y
            out[tag] = round(best * 1e3, 1)  # noqa: F821
            print(f"[tp] {tag}: {best*1e3:.1f} ms", flush=True)
        except Exception as e:
            out[tag] = f"failed: {e!r}"
            print(f"[tp] {tag} failed: {e!r}", flush=True)
    save(f"transpose_ms_v{v}", out)


def part_walkloc():
    """Walk-gather locality on a REAL graph: uniform-walk rate on arxiv
    before/after RCM relabeling (same executable — shapes unchanged).
    The synthetic flagship graph is an expander (relabeling can't
    localise it); arxiv has real community structure."""
    import jax
    import jax.numpy as jnp

    import graphtpu
    from graphtpu.core.reorder import locality_score, rcm_order, relabel_graph
    from graphtpu.walks.walker import uniform_walks

    g = graphtpu.read_edgelist_graph(ARXIV, n_nodes=38912)
    key = jax.random.key(0)
    nodes = np.flatnonzero(np.asarray(g.deg) > 0).astype(np.int32)
    b, l = 65536, 40
    starts = jnp.asarray(np.random.default_rng(1).choice(nodes, size=b))
    walk_fn = jax.jit(lambda gg, s, k: uniform_walks(gg, s, l, k))
    walk_sorted = jax.jit(
        lambda gg, s, k: uniform_walks(gg, s, l, k, sort_gather=True)
    )

    def timed(gg, ss, fn=None):
        fn = fn or walk_fn
        jax.block_until_ready(fn(gg, ss, key))
        best = 1e9
        for _ in range(4):
            t0 = time.time()
            jax.block_until_ready(fn(gg, ss, key))
            best = min(best, time.time() - t0)
        return best

    base = timed(g, starts)
    base_sorted = timed(g, starts, walk_sorted)
    g2, inv = relabel_graph(g, rcm_order(g))
    starts2 = jnp.asarray(np.asarray(inv)[np.asarray(starts)])
    rel = timed(g2, starts2)
    rel_sorted = timed(g2, starts2, walk_sorted)
    save("walk_locality_arxiv", {
        "base_ms": round(base * 1e3, 1),
        "sorted_ms": round(base_sorted * 1e3, 1),
        "rcm_ms": round(rel * 1e3, 1),
        "rcm_sorted_ms": round(rel_sorted * 1e3, 1),
        "base_mhops": round(b * l / base / 1e6, 1),
        "sorted_mhops": round(b * l / base_sorted / 1e6, 1),
        "rcm_mhops": round(b * l / rel / 1e6, 1),
        "rcm_sorted_mhops": round(b * l / rel_sorted / 1e6, 1),
        "locality_before": round(locality_score(g), 4),
        "locality_after": round(locality_score(g2), 4),
    })


def part_flagship_relabel():
    """VERDICT r4 #3 at full scale: 5 base + 5 sorted + 5 RCM (+5
    RCM+sorted) flagship tiles on the 10M graph.  In-process (one
    process per member recovery cycle)."""
    import tools.exp_flagship_relabel as fr

    old_argv = sys.argv
    sys.argv = ["exp_flagship_relabel.py"]
    try:
        fr.main()
    finally:
        sys.argv = old_argv
    res = json.load(open(os.path.join(
        os.path.dirname(OUT), "flagship_relabel_r5.json")))
    save("flagship_relabel", res)


def part_segsum():
    """segsum_pallas vs the production sort+cumsum segment_rows_sum at
    the blog shape [205k, 128] -> [10313, 128]."""
    import jax
    import jax.numpy as jnp

    from graphtpu.kernels.topk import segment_rows_sum

    n, d, s = 204800, 128, 10313
    rng = np.random.default_rng(0)
    ids = jnp.asarray(np.sort(rng.integers(0, s, size=n)).astype(np.int32))
    rows = jnp.asarray(rng.random((n, d)).astype(np.float32))

    out = {}
    f_sort = jax.jit(lambda i, r: segment_rows_sum(i, r, s))
    y = f_sort(ids, rows)
    jax.block_until_ready(y)
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(f_sort(ids, rows))
        best = min(best, time.time() - t0)
    out["sort_cumsum_ms"] = round(best * 1e3, 2)
    # segsum_pallas was ADJUDICATED OUT in round 5 (32.9 ms vs the sort
    # path's 29.0 ms on hardware; results/r5_batch.json) and deleted
    # per the RESULTS_r5 decision rule.
    save("segsum_blogshape", out)


def main():
    import graphtpu  # noqa: F401 - registers the pinned pool member
    import jax

    if os.environ.get("GRAPHTPU_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    if os.path.exists(OUT):
        RES.update(json.load(open(OUT)))
    if jax.default_backend() != "cpu":
        from graphtpu.axon_pin import canary

        canary(timeout_s=180.0)
        import jax.numpy as jnp

        # reserve the recycle-burn operand BEFORE any probe: after a
        # failed multi-GB allocation even 128 KB dies on a saturated
        # member (round-5 observation)
        try:
            burn_x = jnp.ones((256, 256), jnp.bfloat16)
            jax.block_until_ready(burn_x)
        except Exception:
            burn_x = None

        def _fits(gib_each):
            try:
                n = int(gib_each * 2**30 / 4 / (1024 * 1024))
                a = jnp.zeros((n, 1024, 1024), jnp.float32) + 1
                b = jnp.zeros((n, 1024, 1024), jnp.float32) + 2
                jax.block_until_ready((a, b))
                del a, b
                return True
            except Exception:
                return False
            finally:
                # flush async frees on BOTH paths before any later
                # os._exit — a failed probe may still have allocated
                # its first buffer (leak hazard into the shared pool)
                try:
                    jax.block_until_ready(jnp.zeros((8,)) + 1)
                except Exception:
                    pass

        if os.environ.get("GRAPHTPU_BATCH_NO_PROBE"):
            # last-resort mode: skip tier gating (the f1/segsum parts
            # need <100 MB and may fit members that fail the 320 MB
            # probe); heavy parts still gate on hbm_full below
            hbm_full = False
            print("[batch] probe skipped (GRAPHTPU_BATCH_NO_PROBE)",
                  flush=True)
        else:
            # probe SMALL first: one failed multi-GB allocation can
            # break every later allocation in this process (round-5),
            # so the order must be small tier -> [small parts] -> full
            # tier -> [heavy parts]; the full probe is DEFERRED to
            # after the small parts run (see main loop below)
            hbm_small = _fits(0.15)  # f1/segsum ~100 MB
            print(f"[batch] hbm small tier: {hbm_small}", flush=True)
            if not hbm_small:
                print("[batch] member poisoned beyond use; submitting "
                      "watchdog burn to recycle its worker", flush=True)
                from graphtpu.axon_pin import submit_burn

                died = submit_burn(x=burn_x)
                # exit 5: the burn may have recycled this worker —
                # callers should retry THIS member after ~5 min, not a
                # full recovery window
                os._exit(5 if died else 3)
    else:
        hbm_full = True

    import faulthandler

    faulthandler.dump_traceback_later(900, repeat=True)

    only = set(sys.argv[1:])
    t00 = time.time()
    hbm_full = None  # resolved lazily AFTER the small parts

    probe_cache = {}

    def fits_fn(gib):
        if jax.default_backend() == "cpu":
            return True
        if os.environ.get("GRAPHTPU_BATCH_NO_PROBE"):
            return False
        if gib not in probe_cache:
            probe_cache[gib] = _fits(gib)
        return probe_cache[gib]

    def full_tier():
        nonlocal hbm_full
        if hbm_full is None:
            hbm_full = fits_fn(5.7)
            print(f"[batch] hbm full tier: {hbm_full}", flush=True)
        return hbm_full

    # STRICTLY ASCENDING probe order: a failed multi-GB probe corrupts
    # every later allocation, so no part may trigger a bigger probe
    # than its successors need (round-5, twice bitten)
    for name, fn in (
        ("f1", part_f1),
        ("segsum", part_segsum),
        ("walkloc", part_walkloc),
        ("transpose", lambda: part_transpose(11264)),      # fits(1.2)
        ("flagship", part_flagship_relabel),               # fits(2.5)
        ("spmm", lambda: part_spmm(fits_fn)),              # 1.2 then 5.7
        ("parity16", part_parity16),                       # fits(1.2)
        ("arxiv16", lambda: part_arxiv16(fits_fn)),        # fits(3.2)
        ("fast16", lambda: part_fast16(full_tier())),      # full
        ("transpose_arxiv", lambda: part_transpose(38912)),
    ):
        if only and name not in only:
            continue
        if name == "parity16" and not fits_fn(1.2):
            print(f"[batch] {name} skipped: needs ~2.5 GiB free",
                  flush=True)
            continue
        if name == "transpose" and not fits_fn(1.2):
            print(f"[batch] {name} skipped: needs ~2.5 GiB free",
                  flush=True)
            continue
        if name == "flagship" and not fits_fn(2.5):
            print(f"[batch] {name} skipped: needs ~5 GiB free",
                  flush=True)
            continue
        if name in ("fast16", "transpose_arxiv") and not full_tier():
            print(f"[batch] {name} skipped: needs the full HBM tier",
                  flush=True)
            continue
        t0 = time.time()
        try:
            fn()
            print(f"[batch] {name} done {time.time()-t0:.0f}s "
                  f"(total {time.time()-t00:.0f}s)", flush=True)
        except Exception as e:
            print(f"[batch] {name} FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
