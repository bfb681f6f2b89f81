"""Reference QA protocol for real (VERDICT #4): precision@20 + NDCG@20
vs 30-iteration gold over the reference sample grid, per engine, on the
reference's own datasets.

Protocol match: ``benchmark/Test_u_u_TopSim_singleSample.java:25-64``
(grid {1000, 2500, 5000, 10000, 20000, 40000}), gold = naive SimRank 30
iters (``:17-18``), scoring = ``utils/Eval.java:81-140`` (realK+MIN
precision) and ``:257-291`` (NDCG).  Deviation from the reference: the
score is estimated over a fixed random subset of sources (default 2048)
instead of every vertex — the estimate's standard error is ~1/sqrt(2048)
≈ 2%, and the full-V sweep would cost ~90 min of chip time.

Usage: python tools/run_sweeps.py [n_sources] [out.jsonl] [dataset ...]

Resumable: (dataset, algorithm, sample) records already present in
``out.jsonl`` are skipped, so an interrupted sweep continues where it
left off (the windowed-job pattern, ``BatchSingleWalkVertex.java:108-133``).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATASETS = {
    "moreno_crime": (
        "/root/reference/DeepSim/lshrank_data/realdata/moreno_crime_crime.txt",
        None,
        "dense",
    ),
    "blog": (
        "/root/reference/DeepSim/lshrank_data/realdata/blog.txt",
        10496,
        "dense",
    ),
    "arxiv": (
        "/root/reference/DeepSim/lshrank_data/realdata/arxiv_author_pub.txt",
        38912,
        "spmm",
    ),
}


def main():
    import jax

    import graphtpu
    from graphtpu.bench.sweep import (
        REFERENCE_SAMPLE_GRID,
        gold_standard,
        sweep_topsim,
        sweep_uniwalk,
    )

    n_src = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results", "sweeps_r3.jsonl")
    )
    want = set(sys.argv[3:]) or set(DATASETS)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    done = set()
    if os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    done.add((r["dataset"], r["algorithm"], float(r["sample"])))
                except Exception:
                    pass
    out = open(out_path, "a")

    for name, (path, n_nodes, gold_impl) in DATASETS.items():
        if name not in want:
            continue
        need = [
            s for s in REFERENCE_SAMPLE_GRID
            if any(
                (name, alg, float(s)) not in done
                for alg in ("uniwalk", "topsim_singleSample")
            )
        ]
        if not need:
            print(f"{name}: complete, skipping", flush=True)
            continue
        g = graphtpu.read_edgelist_graph(path, n_nodes=n_nodes)
        rng = np.random.default_rng(0)
        ns = min(n_src, g.n_nodes)
        sources = np.sort(
            rng.choice(g.n_nodes, size=ns, replace=False)
        ).astype(np.int32)
        t0 = time.time()
        gold = gold_standard(g, sources=sources, impl=gold_impl)
        print(
            f"{name}: V={g.n_nodes} slots={g.n_edges} gold({gold_impl}) "
            f"{time.time()-t0:.1f}s, {ns} sources",
            flush=True,
        )
        for engine, fn in [("uniwalk", sweep_uniwalk), ("topsim", sweep_topsim)]:
            alg = "uniwalk" if engine == "uniwalk" else "topsim_singleSample"
            for s in REFERENCE_SAMPLE_GRID:
                if (name, alg, float(s)) in done:
                    print(f"{name}/{alg}/{s}: done, skipping", flush=True)
                    continue
                for r in fn(
                    g, gold, samples=[s],
                    key=jax.random.key(11), sources=sources,
                ):
                    rec = {"dataset": name, **dataclasses.asdict(r)}
                    print(json.dumps(rec), flush=True)
                    out.write(json.dumps(rec) + "\n")
                    out.flush()
    out.close()


if __name__ == "__main__":
    main()
