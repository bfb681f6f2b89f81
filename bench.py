#!/usr/bin/env python
"""Headline benchmark — exact SimRank on BlogCatalog, real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's gold-standard computation — exact iterative
SimRank on its largest "single JVM" dataset (blog, V=10313, E=333,982;
``conf/MyConfiguration.java:29``, ``simrank/SimRank.java``).  The Java
inner loop performs sum_{i<j} d_i*d_j ~ (2E)^2/2 neighbour-pair updates
per iteration; we count that same algorithmic work and report
giga-pair-updates/second.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is a generous estimate of its single-threaded JVM inner loop at
150e6 pair-updates/s (double-precision random-access accumulate) — i.e.
~25 minutes per iteration on blog, consistent with the repo treating
30-iteration runs as offline gold-standard jobs.

Secondary numbers (walks/s etc.) go to stderr; the driver consumes the
single stdout line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

JVM_BASELINE_UPDATES_PER_S = 150e6

BLOG = "/root/reference/DeepSim/lshrank_data/realdata/blog.txt"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


CANARY_EXIT = 3


def _tpu_mode() -> bool:
    """One detection mechanism for orchestrate() and main() (ADVICE r3):
    the axon plugin registers via sitecustomize, so the env var alone can
    miss TPU mode; the plugin .so on disk is the ground truth."""
    if os.environ.get("GRAPHTPU_BENCH_FORCE_CPU"):
        return False
    return (
        os.environ.get("JAX_PLATFORMS", "") == "axon"
        or os.path.exists("/opt/axon/libaxon_pjrt.so")
    )


def orchestrate():
    """Try the real bench pinned to each pool member in turn.

    A pool member recovered from a wedge serves exactly ONE process per
    recovery cycle (CLAUDE.md "TPU worker recovery") — so probing with a
    throwaway process and then launching the real job guarantees the
    real job lands on a dead member.  Instead the REAL bench process
    opens with an in-process canary (watchdog thread -> exit 3) and the
    orchestrator simply moves to the next member on exit 3."""
    import subprocess

    attempts = [None] if not _tpu_mode() else [
        "8082", "8092", "8102", "8112", None
    ]
    log(f"orchestrate: tpu_mode={_tpu_mode()} attempts={attempts}")
    budget = float(os.environ.get("GRAPHTPU_BENCH_TIMEOUT", 3600))

    def run_member(port, extra_args=()):
        env = dict(os.environ)
        if port is not None:
            env["GRAPHTPU_AXON_MEMBER"] = port
            env["PALLAS_AXON_POOL_IPS"] = ""
        try:
            cp = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run",
                 *extra_args],
                stdout=subprocess.PIPE,
                timeout=budget,
                env=env,
            )
        except subprocess.TimeoutExpired:
            log(f"bench on member {port}: timed out")
            return None, None
        out = cp.stdout.decode()
        if cp.returncode == CANARY_EXIT:
            log(f"bench on member {port}: canary dead, trying next")
            return None, None
        for line in out.splitlines():
            if line.strip().startswith("{"):
                return cp.returncode, line.strip()
        log(f"bench on member {port}: rc={cp.returncode}, no JSON")
        return cp.returncode, None

    for a_i, port in enumerate(attempts):
        rc, line = run_member(port)
        if line is None:
            continue
        # per-extras member retry (VERDICT r4 #10): the headline may have
        # landed on a member whose poisoned HBM skipped the arxiv spmm
        # extras — retry JUST the spmm suite on the remaining members
        # rather than shipping a result with a skipped section
        try:
            result = json.loads(line)
        except Exception:
            print(line)
            return 0
        extras = result.get("extras", {})
        if (
            _tpu_mode()
            and "spmm_arxiv_ms_per_iter" not in extras
            and os.path.exists(ARXIV)  # no member can fix a missing file
        ):
            for port2 in attempts[a_i + 1:]:
                log(f"retrying spmm extras on member {port2}")
                _, line2 = run_member(port2, ("--spmm-only",))
                if line2 is None:
                    continue
                try:
                    extras.update(json.loads(line2))
                except Exception:
                    continue
                if "spmm_arxiv_ms_per_iter" in extras:
                    break
            result["extras"] = extras
        print(json.dumps(result))
        return 0
    log("bench: no member produced a result")
    return 1


def _maybe_force_cpu():
    # GRAPHTPU_BENCH_FORCE_CPU=1: smoke-test the bench flow off-TPU.  The
    # axon plugin OVERRIDES JAX_PLATFORMS=cpu (CLAUDE.md), so this must
    # go through jax.config before first backend use.
    if os.environ.get("GRAPHTPU_BENCH_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")


def main():
    _maybe_force_cpu()
    import jax
    import jax.numpy as jnp

    import graphtpu
    from graphtpu.core.graph import dense_adjacency, row_normalized
    from graphtpu.simrank.exact import _simrank_iterate

    log(f"devices: {jax.devices()}")
    _burn_x = None
    if jax.default_backend() != "cpu":
        from graphtpu.axon_pin import canary

        canary(timeout_s=180.0, exit_code=CANARY_EXIT)
        try:
            # reserve the recycle-burn operand before any big alloc
            # (after a failed multi-GB allocation even 128 KB dies)
            _burn_x = jnp.ones((256, 256), jnp.bfloat16)
            jax.block_until_ready(_burn_x)
        except Exception:
            _burn_x = None
        try:  # HBM diagnostics: poisoned members show bytes_in_use high
            ms = jax.local_devices()[0].memory_stats() or {}
            log(
                "hbm: in_use="
                f"{ms.get('bytes_in_use', -1)/2**30:.2f} GiB "
                f"limit={ms.get('bytes_limit', -1)/2**30:.2f} GiB"
            )
        except Exception as e:  # pragma: no cover - backend-dependent
            log(f"hbm stats unavailable: {e!r}")

    if os.path.exists(BLOG):
        # pad V to a multiple of 256 for MXU tiling (isolated pad nodes
        # have zero degree -> zero W columns -> exact result on real block)
        g = graphtpu.read_edgelist_graph(BLOG, n_nodes=10496)
        n_edges_undirected = 333983  # lines in blog.txt (each one edge)
    else:
        rng = np.random.default_rng(0)
        edges = rng.integers(0, 10240, size=(330000, 2)).astype(np.int64)
        g = graphtpu.build_graph(edges, n_nodes=10496)
        n_edges_undirected = 330000
    log(f"graph: V={g.n_nodes} slots={g.n_edges}")

    # move W to the device ONCE (the 440MB dense operand dwarfs everything
    # when re-uploaded per call through the axon tunnel)
    t0 = time.time()
    try:
        w = row_normalized(dense_adjacency(g))
        w.block_until_ready()
    except Exception as e:
        # leak-poisoned member: cannot even hold the headline operand.
        # Submit the watchdog burn so THIS member's worker recycles
        # (freeing its leaked HBM), then fail -> orchestrate moves on.
        log(f"headline operand failed ({e!r}); submitting recycle burn")
        from graphtpu.axon_pin import submit_burn

        submit_burn(x=_burn_x)
        sys.exit(1)
    log(f"W build+transfer: {time.time() - t0:.1f}s")

    iters = 10

    # compile + warm up the EXACT executable being timed: ``iterations`` is
    # a static argument, so warming up a different count would leave a full
    # fresh compile (~1.5-2.5s) inside the timed region — the methodology
    # bug that inflated every early per-iter number by ~150-250 ms.
    t0 = time.time()
    s = _simrank_iterate(w, 0.6, iters, "high")
    s.block_until_ready()
    log(f"warmup(compile): {time.time() - t0:.1f}s")

    per_iter = 1e9
    for _ in range(3):
        t0 = time.time()
        s = _simrank_iterate(w, 0.6, iters, "high")
        s.block_until_ready()
        per_iter = min(per_iter, (time.time() - t0) / iters)

    # fidelity check vs highest-precision run (top-20 ranking agreement)
    t0 = time.time()
    s_hi = _simrank_iterate(w, 0.6, 3, "highest")
    s_hi.block_until_ready()
    hi_3 = time.time() - t0
    s_lo = _simrank_iterate(w, 0.6, 3, "high")
    sl = np.asarray(s_lo[:512, :10313])
    sh = np.asarray(s_hi[:512, :10313])
    agree = np.mean(
        [
            len(set(np.argsort(-sl[r])[:20]) & set(np.argsort(-sh[r])[:20])) / 20
            for r in range(512)
        ]
    )
    log(f"high-vs-highest top-20 agreement: {agree:.4f}; highest 3-iter: {hi_3:.1f}s")
    # free the blog device operands NOW: spmm_metrics allocates two
    # 6.05 GB arxiv iterates and OOM'd in round 3 with w + three [V,V]
    # blog buffers (~1.8 GB) still resident (BENCH_r03 RESOURCE_EXHAUSTED)
    del w, s, s_hi, s_lo

    work_per_iter = (2.0 * n_edges_undirected) ** 2 / 2.0
    updates_per_s = work_per_iter / per_iter
    value = updates_per_s / 1e9
    log(f"per-iter: {per_iter * 1e3:.1f} ms -> {value:.1f} G pair-updates/s")

    def result_json(extras):
        return json.dumps({
            "metric": "simrank_exact_blog_pair_updates",
            "value": round(value, 2),
            "unit": "Gupdates/s",
            "vs_baseline": round(
                updates_per_s / JVM_BASELINE_UPDATES_PER_S, 1
            ),
            "extras": extras,
        })

    # extras must never cost us the headline: a wedged worker HANGS (no
    # exception) and a subprocess would be a doomed second process on
    # this pool member — so they run inline under a watchdog thread that
    # prints the headline-only JSON and force-exits on timeout
    import threading

    done = threading.Event()
    print_lock = threading.Lock()
    printed = [False]

    def print_once(payload):
        # the watchdog and the main thread can race at the timeout
        # boundary (ADVICE r3: two JSON lines on stdout); whoever takes
        # the lock first prints, the other is a no-op
        with print_lock:
            if not printed[0]:
                printed[0] = True
                print(payload, flush=True)

    def extras_watchdog():
        if not done.wait(float(os.environ.get("GRAPHTPU_EXTRAS_TIMEOUT",
                                              1500))):
            log("extras: timed out; emitting headline-only JSON")
            print_once(result_json({}))
            sys.stdout.flush()
            os._exit(0)

    threading.Thread(target=extras_watchdog, daemon=True).start()
    extras = {}
    try:
        extras = secondary_metrics(g)
    except Exception as e:  # pragma: no cover - environment failures
        log(f"secondary_metrics failed: {e!r}")
    try:
        extras.update(spmm_metrics(g))
    except Exception as e:  # pragma: no cover - environment failures
        log(f"spmm_metrics failed: {e!r}")
    done.set()
    print_once(result_json(extras))


def secondary_metrics(g):
    """Walks/s (first-order + node2vec 2nd-order) and SGNS step-ms on the
    same blog graph — the reference's other hot loops
    (``structures/Graph.java:69-73`` randNeighbor walking,
    ``node2vec/src/node2vec.py:150-160``, gensim SGNS step).  Reported
    nested in the single stdout JSON line; the timings use warm
    executables (compile excluded, logged to stderr)."""
    import jax
    import jax.numpy as jnp

    from graphtpu.models.sgns import (
        alias_draw_batch,
        build_negative_alias,
        corpus_counts,
        _gather_batch,
        sgns_manual_grads,
    )
    from graphtpu.walks.node2vec import node2vec_walks
    from graphtpu.walks.walker import uniform_walks

    extras = {}
    key = jax.random.key(0)
    nodes = np.flatnonzero(np.asarray(g.deg) > 0).astype(np.int32)

    def timed(fn, *a, reps=3):
        out = fn(*a)
        jax.block_until_ready(out)  # compile + warm
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        return out, best

    # first-order walks: B=65536 walkers, 40 hops each
    b1, l1 = 65536, 40
    starts = jnp.asarray(np.random.default_rng(1).choice(nodes, size=b1))
    t0 = time.time()
    walk_fn = jax.jit(lambda s, k: uniform_walks(g, s, l1, k))
    _, dt = timed(walk_fn, starts, key)
    log(f"uniform walks: compile+run {time.time()-t0:.1f}s, "
        f"warm {dt*1e3:.0f} ms -> {b1*l1/dt/1e6:.1f} M hops/s")
    extras["walk_uniform_mhops_per_s"] = round(b1 * l1 / dt / 1e6, 1)

    # node2vec 2nd-order (rejection), p=1 q=2: B=32768, 20 hops.  The
    # edge set rides as a jit ARGUMENT (device-resident; closure capture
    # would re-embed the table per executable)
    from graphtpu.kernels.edgeset import device_edge_set

    b2, l2 = 32768, 20
    starts2 = jnp.asarray(np.random.default_rng(2).choice(nodes, size=b2))
    es = device_edge_set(g)
    t0 = time.time()
    n2v_fn = jax.jit(
        lambda s, k, e: node2vec_walks(
            g, s, l2, 1.0, 2.0, k, mode="rejection", eset=e
        )
    )
    _, dt = timed(n2v_fn, starts2, key, es)
    log(f"node2vec walks: compile+run {time.time()-t0:.1f}s, "
        f"warm {dt*1e3:.0f} ms -> {b2*l2/dt/1e6:.1f} M hops/s")
    extras["walk_node2vec_mhops_per_s"] = round(b2 * l2 / dt / 1e6, 1)

    # SGNS training step: B=8192 centers, window=10, 5 shared negatives —
    # the production step body (manual grads + sort-based row aggregation),
    # scanned x20 inside one executable to amortise dispatch.
    v = g.n_nodes
    walks = uniform_walks(g, starts[:8192], 40, key)
    counts = corpus_counts(walks, v)
    neg_j, neg_q = build_negative_alias(counts, 0.75)
    batch, window, neg, nscan = 8192, 10, 5, 20

    @jax.jit
    def sgns_chunk(params, w, kk):
        def step(p, k):
            k_s, k_w, k_n = jax.random.split(k, 3)
            slots = jax.random.randint(
                k_s, (batch,), 0, w.shape[0] * w.shape[1]
            )
            centers, contexts, mask = _gather_batch(w, slots, window, k_w)
            negs = alias_draw_batch(neg_j, neg_q, k_n, (batch, neg))
            (g0, g1), (c0, c1) = sgns_manual_grads(
                p, centers, contexts, mask, negs, v
            )
            s0, s1 = p
            lr = 0.025
            return (
                s0 - lr * g0 / jnp.maximum(c0, 1)[:, None],
                s1 - lr * g1 / jnp.maximum(c1, 1)[:, None],
            ), None

        return jax.lax.scan(step, params, jax.random.split(kk, nscan))[0]

    params = (
        jnp.zeros((v, 128), jnp.float32),
        jnp.zeros((v, 128), jnp.float32),
    )
    t0 = time.time()
    params, dt = timed(sgns_chunk, params, walks, key)
    log(f"sgns chunk: compile+run {time.time()-t0:.1f}s, "
        f"warm {dt/nscan*1e3:.2f} ms/step (B={batch}, W={window}, N={neg})")
    extras["sgns_step_ms"] = round(dt / nscan * 1e3, 2)
    return extras


ARXIV = "/root/reference/DeepSim/lshrank_data/realdata/arxiv_author_pub.txt"


def _spmm_suite(g, name, modes, iters=10):
    """Composed streaming-SpMM SimRank per-iter on one dataset — genuinely
    warm second-call timings with the cached ``_spmm_stages`` executables
    (VERDICT r4 #1).  Effective GB/s counts useful DMA traffic: 2 SpMV
    products/iter, each (E_slots + V) row reads + V row writes of V·esize.

    ``modes``: (tag, spmv_mode, dtype, esize, seg) tuples; a mode that
    dies (compile-service death, OOM) must not discard earlier modes."""
    import jax

    from graphtpu.core.config import SimRankConfig
    from graphtpu.simrank.exact import exact_simrank_spmm

    out = {}
    for tag, smode, dtype, esize, seg in modes:
        try:
            bytes_per_iter = (
                2.0 * (g.n_edges + g.n_nodes) * g.n_nodes * esize
            )
            kw = dict(spmv_mode=smode, dtype=dtype, spmv_seg=seg,
                      impl="pallas")
            t0 = time.time()
            s = exact_simrank_spmm(g, SimRankConfig(iterations=iters), **kw)
            s.block_until_ready()
            log(f"spmm {name} {tag} warmup(compile + {iters} iters): "
                f"{time.time()-t0:.1f}s")
            del s  # two live [V,V] f32 iterates would exceed HBM at arxiv
            t0 = time.time()
            s = exact_simrank_spmm(g, SimRankConfig(iterations=iters), **kw)
            s.block_until_ready()
            per = (time.time() - t0) / iters
            del s
            log(f"spmm {name} {tag}: {per*1e3:.1f} ms/iter, "
                f"{bytes_per_iter/per/1e9:.0f} GB/s effective")
            key = f"spmm_{name}" if tag == "kahan" else f"spmm_{name}_{tag}"
            out[f"{key}_ms_per_iter"] = round(per * 1e3, 1)
            out[f"{key}_gbps"] = round(bytes_per_iter / per / 1e9, 0)
        except Exception as e:  # pragma: no cover - env failures
            log(f"spmm {name} {tag} failed: {e!r}")
    return out


def _hbm_probe(gib_each=5.5):
    """Allocate two ``gib_each``-sized buffers (default: arxiv f32
    iterates); a member whose HBM is poisoned by a crashed session
    passes the canary but cannot hold them."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        return True
    try:
        n = int(gib_each * 2**30 / 4 / (1024 * 1024))
        a = jnp.zeros((n, 1024, 1024), jnp.float32) + 1
        b = jnp.zeros((n, 1024, 1024), jnp.float32) + 2
        jax.block_until_ready((a, b))
        del a, b
        return True
    except Exception as e:
        log(f"hbm probe failed ({e!r})")
        return False
    finally:
        # flush the dealloc queue on BOTH paths: an exit before the
        # async frees reach the worker would LEAK probe buffers into
        # the shared pool (a failed probe may hold its first buffer)
        try:
            jax.block_until_ready(jnp.zeros((8,)) + 1)
        except Exception:
            pass


def spmm_metrics(blog_g=None):
    """Streaming-SpMM SimRank per-iter — the bandwidth-bound headline
    (VERDICT r2 #10, r4 #1).  arxiv is the target scale; when the pool
    member's HBM cannot hold arxiv iterates (leak-poisoned), fall back to
    the blog-scale composed loop so a half-dead pool still yields a
    composed number instead of ``skipped`` (VERDICT r4 #10)."""
    import jax
    import jax.numpy as jnp

    import graphtpu
    from graphtpu.core.reorder import rcm_order, relabel_graph

    if jax.default_backend() == "cpu":
        log("spmm suite skipped: pallas streaming kernels are TPU-only")
        return {}
    # CAUTIOUS LADDER (round-5: a failed multi-GB probe corrupts every
    # later allocation in the process): blog first behind a 1.2 GiB
    # probe, arxiv only after its own 5.5 GiB probe passes, moreno as
    # the last-ditch tier.
    out = {}
    mid = _hbm_probe(1.2)
    if blog_g is not None and mid:
        try:
            out.update(_spmm_suite(blog_g, "blog", [
                ("fast", "fast", jnp.float32, 4.0, 1),
            ]))
            g2, _ = relabel_graph(blog_g, rcm_order(blog_g))
            out.update(_spmm_suite(g2, "blog", [
                ("fast_seg2", "fast", jnp.float32, 4.0, 2),
            ]))
        except Exception as e:  # pragma: no cover
            log(f"spmm blog failed: {e!r}")
    # fast16 tier: bf16 iterates are 3.03 GB (peak ~3 live), so the
    # arxiv composed number is reachable on a pool whose shared free
    # ceiling (~10.5 GiB with all four workers resident, round-5 ladder
    # probe) can never hold the f32 suite's 2x6.06 GB + scratch
    if mid and os.path.exists(ARXIV) and _hbm_probe(3.2):
        g16 = graphtpu.read_edgelist_graph(ARXIV, n_nodes=38912)
        out.update(_spmm_suite(g16, "arxiv", [
            ("fast16", "fast", jnp.bfloat16, 2.0, 1),
        ]))
        del g16
    if mid and os.path.exists(ARXIV) and _hbm_probe():
        g = graphtpu.read_edgelist_graph(ARXIV, n_nodes=38912)
        out.update(_spmm_suite(g, "arxiv", [
            ("kahan", "kahan", jnp.float32, 4.0, 1),
            ("fast", "fast", jnp.float32, 4.0, 1),
        ]))
        # coalesced 2-row-DMA stream on the relabelled graph (the
        # adjacent-slot fraction is what the segment plan exploits)
        try:
            g2, _ = relabel_graph(g, rcm_order(g))
            out.update(_spmm_suite(g2, "arxiv", [
                ("fast_seg2", "fast", jnp.float32, 4.0, 2),
            ]))
        except Exception as e:  # pragma: no cover
            log(f"spmm arxiv seg2 failed: {e!r}")
        del g
    if not any(k.startswith("spmm_") for k in out):
        # last-ditch tier: moreno (V=1380 -> 2048 padded, ~16 MB
        # iterates) fits even a nearly-full pool — a tiny composed
        # number still beats "skipped" (VERDICT r4 #10)
        moreno = ("/root/reference/DeepSim/lshrank_data/realdata/"
                  "moreno_crime_crime.txt")
        if os.path.exists(moreno):
            try:
                gm = graphtpu.read_edgelist_graph(moreno)
                out.update(_spmm_suite(gm, "moreno", [
                    ("fast", "fast", jnp.float32, 4.0, 1),
                ]))
            except Exception as e:  # pragma: no cover
                log(f"spmm moreno failed: {e!r}")
    return out


def spmm_only():
    """Extras-only entry (orchestrate retry path): canary, then just the
    spmm suite; prints the extras dict as the JSON line."""
    _maybe_force_cpu()
    import jax

    import graphtpu

    log(f"devices: {jax.devices()}")
    if jax.default_backend() != "cpu":
        from graphtpu.axon_pin import canary

        canary(timeout_s=180.0, exit_code=CANARY_EXIT)
    if os.path.exists(BLOG):
        g = graphtpu.read_edgelist_graph(BLOG, n_nodes=10496)
    else:
        g = None
    out = spmm_metrics(g)
    if not out and jax.default_backend() != "cpu":
        # nothing measured: this member is likely leak-poisoned — burn
        # it so its worker recycles before the next retry lands here
        import jax.numpy as jnp

        log("spmm_only: nothing measured; submitting recycle burn")
        from graphtpu.axon_pin import submit_burn

        submit_burn()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if "--run" in sys.argv:
        if "--spmm-only" in sys.argv:
            spmm_only()
        else:
            main()
    else:
        sys.exit(orchestrate())
