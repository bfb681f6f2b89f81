"""DeepSim at the reference budget on BlogCatalog (VERDICT r3 #8).

Reference flow (``DeepSim/src/main.py:262-289`` + ``DeepSim.py:121-176``):
read the SimRank engine's top-20 ``.sim.txt`` (we generate it with the
exact engine: 3 iterations, C=0.6 — ``simrank/SimRank.java:16``,
``conf/MyConfiguration.java:21``), node2vec walks (10 x 80, cached to
walks.txt), train the AE 50,000 Adam steps at batch 128, lr 1e-3, then
score embeddings with the TopKRanker protocol (``classify.py:155-255``).

Usage: python tools/run_deepsim_blog.py [steps] [fractions...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BLOG_EDGES = "/root/reference/DeepSim/lshrank_data/realdata/blog.txt"
BLOG_MAT = "/root/reference/node2vec/src/blogcatalog.mat"
SIM_PATH = "/tmp/blog_simrank_naive_top20.sim.txt"
WALKS_CACHE = "/tmp/deepsim_blog_walks.txt"


def main():
    import jax

    import graphtpu
    from graphtpu.core.config import DeepSimConfig, SimRankConfig, WalkConfig
    from graphtpu.eval.f1 import topk_ranker_scoring
    from graphtpu.io.matfile import labels_to_lists, load_blogcatalog
    from graphtpu.io.simfile import write_sim_file
    from graphtpu.pipelines_deepsim import deepsim_pipeline
    from graphtpu.simrank.exact import exact_simrank

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    fractions = (
        [float(x) for x in sys.argv[2:]] if len(sys.argv) > 2
        else [0.1, 0.5, 0.9]
    )

    g = graphtpu.read_edgelist_graph(BLOG_EDGES, n_nodes=10313)
    print(f"graph: V={g.n_nodes} slots={g.n_edges}", flush=True)

    if not os.path.exists(SIM_PATH):
        import jax.numpy as jnp

        t0 = time.time()
        sim = exact_simrank(g, SimRankConfig(iterations=3))
        # top-k ON DEVICE: pulling the full [V, V] through the tunnel is
        # ~425 MB at pathological readback rates; [V, 20] is 800 KB
        vals, idx = jax.jit(lambda s: jax.lax.top_k(s, 20))(sim)
        vals, idx = np.asarray(vals), np.asarray(idx)
        write_sim_file(SIM_PATH, idx, vals)
        print(f"sim file: {time.time()-t0:.1f}s -> {SIM_PATH}", flush=True)

    t0 = time.time()
    emb = deepsim_pipeline(
        g,
        SIM_PATH,
        cfg=DeepSimConfig(dim=128, minibatch=128, steps=steps, window=10),
        walk_cfg=WalkConfig(num_walks=10, walk_length=80, p=1.0, q=1.0),
        walks_cache=WALKS_CACHE,
        seed=0,
    )
    print(f"deepsim {steps} steps: {time.time()-t0:.1f}s", flush=True)

    _, group = load_blogcatalog(BLOG_MAT)
    labels = labels_to_lists(group)
    n = group.shape[0]
    feats = emb[1 : n + 1]  # mat row i -> graph id i+1 (classify.py:192)
    res = topk_ranker_scoring(
        feats, labels, group.shape[1],
        train_fractions=fractions, n_shuffles=3, verbose=True,
    )
    summary = {
        str(k): {
            "micro": float(np.mean([r["micro"] for r in v])),
            "macro": float(np.mean([r["macro"] for r in v])),
        }
        for k, v in res.items()
    }
    print(json.dumps({"steps": steps, "f1": summary}))
    with open("/tmp/deepsim_blog_f1.json", "w") as f:
        json.dump({"steps": steps, "f1": summary}, f)


if __name__ == "__main__":
    main()
