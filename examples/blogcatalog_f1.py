"""BlogCatalog node2vec + TopKRanker micro-F1 — the reference's headline
quality experiment (node2vec/src/main.py defaults + classify.scoring).

Long-running: walks (103k x 80) + 10 SGNS epochs on device, then sklearn
logistic-regression sweeps on host.  Writes the .emb and a JSON results
file.  The published node2vec BlogCatalog micro-F1 at 50% train is ~0.36;
the DeepWalk protocol here should land in that neighbourhood.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import graphtpu
from graphtpu.core.config import SGNSConfig, WalkConfig
from graphtpu.eval.f1 import topk_ranker_scoring
from graphtpu.io.matfile import labels_to_lists, load_blogcatalog
from graphtpu.pipelines import node2vec_pipeline

BLOG_EDGES = "/root/reference/DeepSim/lshrank_data/realdata/blog.txt"
BLOG_MAT = "/root/reference/node2vec/src/blogcatalog.mat"


def main(fractions=(0.1, 0.5, 0.9), epochs=10, out="/tmp/blog.emb"):
    t0 = time.time()
    g = graphtpu.read_edgelist_graph(BLOG_EDGES, n_nodes=10313)
    print(f"graph: V={g.n_nodes} slots={g.n_edges}", flush=True)
    emb = node2vec_pipeline(
        g,
        walk_cfg=WalkConfig(num_walks=10, walk_length=80, p=0.25, q=0.25),
        sgns_cfg=SGNSConfig(dim=128, window=10, epochs=epochs, batch_size=8192),
        output=out,
    )
    print(f"training done in {time.time() - t0:.0f}s", flush=True)

    _, group = load_blogcatalog(BLOG_MAT)
    labels = labels_to_lists(group)
    # mat rows are nodes 1..N in .emb labelling = graph ids 1..N? The blog
    # edge list is 0-based with node ids 1..10312 used; mat row i is node
    # i+1 in the 1-based convention (classify.py:192). Our graph ids are
    # the raw file ids; map mat row i -> graph id i+1.
    n = group.shape[0]
    feats = emb[1 : n + 1]
    res = topk_ranker_scoring(
        feats, labels, group.shape[1],
        train_fractions=list(fractions), n_shuffles=3, verbose=True,
    )
    summary = {
        str(k): {
            "micro": float(np.mean([r["micro"] for r in v])),
            "macro": float(np.mean([r["macro"] for r in v])),
        }
        for k, v in res.items()
    }
    print(json.dumps(summary, indent=2))
    with open("/tmp/blog_f1.json", "w") as f:
        json.dump(summary, f)
    return summary


if __name__ == "__main__":
    main()
