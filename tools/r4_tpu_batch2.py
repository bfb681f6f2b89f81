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
        # Tiered HBM probe: a member that hosted a crashed session can
        # pass the canary yet hold leaked multi-GB buffers until its
        # worker restarts.  Full tier = two f32 arxiv iterates (12 GB);
        # half tier = two bf16 iterates (6 GB) — enough for a fast16
        # composed timing even on a partially poisoned member.
        import jax.numpy as jnp

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

        hbm_full = _fits(5.7)
        hbm_half = hbm_full or _fits(2.9)
        print(f"[batch2] hbm probe: full={hbm_full} half={hbm_half}",
              flush=True)
        if not hbm_half:
            print("[batch2] member poisoned beyond use", flush=True)
            os._exit(3)
    else:
        hbm_full = hbm_half = True

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

    # 2. kernel item-rate microbench (needs the full 12 GB tier)
    if hbm_full:
        try:
            import tools.exp_spmv_rate as rate

            rate.main()
            print(f"[batch2] spmv rate done {time.time()-t0:.0f}s",
                  flush=True)
        except Exception as e:
            print(f"[batch2] spmv rate FAILED {e!r}", flush=True)
    else:
        print("[batch2] spmv rate skipped (half-HBM member)", flush=True)

    # 3. clean arxiv spmm per-iter with the round-4 loop
    import gc

    gc.collect()
    import graphtpu
    from graphtpu.core.config import SimRankConfig
    from graphtpu.simrank.exact import exact_simrank_spmm

    try:
        import jax.numpy as jnp2

        arxiv = "/root/reference/DeepSim/lshrank_data/realdata/arxiv_author_pub.txt"
        g = graphtpu.read_edgelist_graph(arxiv, n_nodes=38912)
        iters = 10
        configs = [("kahan", jnp2.float32, 4.0), ("fast16", jnp2.bfloat16, 2.0)]
        if not hbm_full:
            configs = configs[1:]  # bf16 iterates fit the half tier
        for mname, dt, esz in configs:
            smode = "fast" if mname == "fast16" else mname
            tt = time.time()
            s = exact_simrank_spmm(g, SimRankConfig(iterations=iters),
                                   spmv_mode=smode, dtype=dt)
            s.block_until_ready()
            print(f"arxiv {mname} warm-up (compile + {iters} iters): "
                  f"{time.time()-tt:.1f}s", flush=True)
            del s
            best = 1e9
            for _ in range(2):
                tt = time.time()
                s = exact_simrank_spmm(g, SimRankConfig(iterations=iters),
                                       spmv_mode=smode, dtype=dt)
                s.block_until_ready()
                best = min(best, (time.time() - tt) / iters)
                del s
            bpi = 2.0 * (g.n_edges + g.n_nodes) * g.n_nodes * esz
            print(json.dumps({
                f"spmm_arxiv_r4loop_{mname}_ms_per_iter": round(best * 1e3, 1),
                f"spmm_arxiv_r4loop_{mname}_gbps": round(bpi / best / 1e9, 1),
            }), flush=True)
    except Exception as e:
        print(f"[batch2] arxiv clean timing FAILED {e!r}", flush=True)
    print(f"[batch2] ALL DONE {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
