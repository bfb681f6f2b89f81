"""Second one-process chip session for round 4:

  1. resume the engine sweeps (the 7 blog points the dead compile
     service ate — now one shared executable per grid)
  2. the streaming-SpMV item-rate microbench (tools/exp_spmv_rate.py)
  3. a clean (no profile syncs) warm arxiv spmm timing with the fused
     scale-pin + one-dispatch transpose
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import graphtpu  # noqa: F401 - registers the pinned pool member
    import jax

    if jax.default_backend() != "cpu":
        from graphtpu.axon_pin import canary

        canary(timeout_s=180.0)
        # HBM probe: a member that hosted a crashed session can pass the
        # canary yet hold leaked multi-GB buffers until its worker
        # restarts — every big allocation then dies RESOURCE_EXHAUSTED.
        # Exit 3 (= cycle to the next member) if two iterate-sized
        # buffers don't fit.
        try:
            import jax.numpy as jnp

            a = jnp.zeros((1408, 1024, 1024), jnp.float32) + 1  # 5.5 GB
            b = jnp.zeros((1408, 1024, 1024), jnp.float32) + 2
            jax.block_until_ready((a, b))
            del a, b
        except Exception as e:
            print(f"[batch2] HBM probe failed ({e!r}); member poisoned",
                  flush=True)
            os._exit(3)

    t0 = time.time()

    # 1. resume engine sweeps (moreno complete; blog holes)
    import tools.run_sweeps as rs

    os.environ["GRAPHTPU_SWEEP_ALGS"] = (
        "doubleRandomWalk,topsim_doubleSample,topsim_dev"
    )
    os.environ.pop("GRAPHTPU_SWEEP_SAMPLES", None)
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "sweeps_r4.jsonl",
    )
    sys.argv = ["run_sweeps.py", "2048", out_path, "blog", "moreno_crime"]
    try:
        rs.main()
        print(f"[batch2] sweeps done {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"[batch2] sweeps FAILED {e!r}", flush=True)

    # 2. kernel item-rate microbench
    try:
        import tools.exp_spmv_rate as rate

        rate.main()
        print(f"[batch2] spmv rate done {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"[batch2] spmv rate FAILED {e!r}", flush=True)

    # 3. clean arxiv spmm per-iter with the round-4 loop
    import gc

    gc.collect()
    import graphtpu
    from graphtpu.core.config import SimRankConfig
    from graphtpu.simrank.exact import exact_simrank_spmm

    try:
        arxiv = "/root/reference/DeepSim/lshrank_data/realdata/arxiv_author_pub.txt"
        g = graphtpu.read_edgelist_graph(arxiv, n_nodes=38912)
        iters = 10
        tt = time.time()
        s = exact_simrank_spmm(g, SimRankConfig(iterations=iters))
        s.block_until_ready()
        print(f"arxiv warm-up (compile + {iters} iters): {time.time()-tt:.1f}s",
              flush=True)
        del s
        best = 1e9
        for _ in range(2):
            tt = time.time()
            s = exact_simrank_spmm(g, SimRankConfig(iterations=iters))
            s.block_until_ready()
            best = min(best, (time.time() - tt) / iters)
            del s
        bytes_per_iter = 2.0 * (g.n_edges + g.n_nodes) * g.n_nodes * 4.0
        print(json.dumps({
            "spmm_arxiv_r4loop_ms_per_iter": round(best * 1e3, 1),
            "spmm_arxiv_r4loop_gbps": round(bytes_per_iter / best / 1e9, 1),
        }), flush=True)
    except Exception as e:
        print(f"[batch2] arxiv clean timing FAILED {e!r}", flush=True)
    print(f"[batch2] ALL DONE {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
