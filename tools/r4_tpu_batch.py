"""One-process TPU batch for the round-4 measurement items (one pool
member serves one process per recovery cycle, so everything that needs
the chip this session runs from a single process):

  1. gold sweeps for the round-4 engine families on moreno_crime + blog
     (results/sweeps_r4.jsonl)
  2. full-V blog sweep at sample=10000 for uniwalk + topsim — the
     subset-estimator validation (VERDICT r3 #6)
  3. SpMM SimRank iterate, jitted vs GRAPHTPU_EAGER per-op dispatch, at
     blog scale (VERDICT r3 #3's second kernel)

Usage: PALLAS_AXON_POOL_IPS= GRAPHTPU_AXON_MEMBER=8xx2 python tools/r4_tpu_batch.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def spmm_modes():
    import jax

    import graphtpu
    from graphtpu.core.config import SimRankConfig
    from graphtpu.simrank.exact import exact_simrank_spmm

    blog = "/root/reference/DeepSim/lshrank_data/realdata/blog.txt"
    g = graphtpu.read_edgelist_graph(blog, n_nodes=10496)
    out = {}
    iters = 5
    for eager in (False, True):
        if eager:
            os.environ["GRAPHTPU_EAGER"] = "1"
        else:
            os.environ.pop("GRAPHTPU_EAGER", None)
        t0 = time.time()
        s = exact_simrank_spmm(g, SimRankConfig(iterations=iters))
        s.block_until_ready()
        warm = time.time() - t0
        del s
        t0 = time.time()
        s = exact_simrank_spmm(g, SimRankConfig(iterations=iters))
        s.block_until_ready()
        per = (time.time() - t0) / iters
        del s
        mode = "eager" if eager else "jit"
        print(f"spmm blog {mode}: warmup {warm:.1f}s, {per*1e3:.0f} ms/iter",
              flush=True)
        out[f"spmm_blog_{mode}_ms_per_iter"] = round(per * 1e3, 1)
    os.environ.pop("GRAPHTPU_EAGER", None)
    print(json.dumps(out), flush=True)
    return out


def n2v_worst_case():
    """Adaptive-panel throughput at the ADVERSARIAL (p, q) — the round-3
    table's worst row (p=q=0.25 ⇒ fixed T=24 panel, 2.71 M hops/s);
    VERDICT r3 #8 acceptance is >=5 M hops/s here."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    import graphtpu
    from graphtpu.kernels.edgeset import device_edge_set
    from graphtpu.walks.node2vec import node2vec_walks

    blog = "/root/reference/DeepSim/lshrank_data/realdata/blog.txt"
    g = graphtpu.read_edgelist_graph(blog, n_nodes=10496)
    nodes = np.flatnonzero(np.asarray(g.deg) > 0).astype(np.int32)
    es = device_edge_set(g)
    out = {}
    for b, l in ((10240, 80), (102400, 80)):
        starts = jnp.asarray(np.random.default_rng(5).choice(nodes, size=b))
        fn = jax.jit(
            lambda s, k, e: node2vec_walks(
                g, s, l, 0.25, 0.25, k, mode="rejection", eset=e
            )
        )
        t0 = time.time()
        w = fn(starts, jax.random.key(1), es)
        jax.block_until_ready(w)
        print(f"n2v worst-case B={b}: compile+run {time.time()-t0:.1f}s",
              flush=True)
        best = 1e9
        for i in range(3):
            t0 = time.time()
            w = fn(starts, jax.random.key(2 + i), es)
            jax.block_until_ready(w)
            best = min(best, time.time() - t0)
        mh = b * l / best / 1e6
        print(f"n2v worst-case B={b}: warm {best*1e3:.0f} ms = "
              f"{mh:.2f} M hops/s", flush=True)
        out[f"n2v_pq025_b{b}_mhops"] = round(mh, 2)
    print(json.dumps(out), flush=True)
    return out


def main():
    import graphtpu  # noqa: F401 - registers the pinned pool member
    import jax

    if jax.default_backend() != "cpu":
        from graphtpu.axon_pin import canary

        canary(timeout_s=180.0)

    import tools.run_sweeps as rs

    t0 = time.time()
    # 1. the round-4 engine families, 2048-source protocol
    os.environ["GRAPHTPU_SWEEP_ALGS"] = (
        "doubleRandomWalk,topsim_doubleSample,topsim_dev"
    )
    os.environ.pop("GRAPHTPU_SWEEP_SAMPLES", None)
    sys.argv = ["run_sweeps.py", "2048", "", "moreno_crime", "blog"]
    sys.argv[2] = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "sweeps_r4.jsonl",
    )
    try:
        rs.main()
        print(f"[batch] engine sweeps done {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"[batch] engine sweeps FAILED {e!r}", flush=True)

    # 2. full-V blog estimator validation at one mid-grid budget
    os.environ["GRAPHTPU_SWEEP_ALGS"] = "uniwalk,topsim_singleSample"
    os.environ["GRAPHTPU_SWEEP_SAMPLES"] = "10000"
    sys.argv = ["run_sweeps.py", "20000", sys.argv[2], "blog"]
    try:
        rs.main()
        print(f"[batch] full-V blog done {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"[batch] full-V blog FAILED {e!r}", flush=True)

    # 3. adaptive-panel worst-case walk throughput
    try:
        n2v_worst_case()
        print(f"[batch] n2v worst-case done {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"[batch] n2v worst-case FAILED {e!r}", flush=True)

    # 4. spmm jit vs eager
    try:
        spmm_modes()
        print(f"[batch] spmm modes done {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"[batch] spmm modes FAILED {e!r}", flush=True)

    # 5. per-stage profile of the arxiv spmm iterate (what turned the
    # r2 254 GB/s into r4's 65 GB/s: stages or kernel?)
    import graphtpu
    from graphtpu.core.config import SimRankConfig
    from graphtpu.simrank.exact import exact_simrank_spmm

    arxiv = "/root/reference/DeepSim/lshrank_data/realdata/arxiv_author_pub.txt"
    g = graphtpu.read_edgelist_graph(arxiv, n_nodes=38912)
    os.environ["GRAPHTPU_SPMM_PROFILE"] = "1"
    tt = time.time()
    s = exact_simrank_spmm(g, SimRankConfig(iterations=5))
    s.block_until_ready()
    print(f"arxiv profiled 5 iters (cold): {time.time()-tt:.1f}s", flush=True)
    del s
    tt = time.time()
    s = exact_simrank_spmm(g, SimRankConfig(iterations=5))
    s.block_until_ready()
    print(f"arxiv profiled 5 iters (warm): {time.time()-tt:.1f}s", flush=True)
    del s
    os.environ.pop("GRAPHTPU_SPMM_PROFILE", None)
    print(f"[batch] ALL DONE {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
