"""End-to-end node2vec on the karate graph — the reference demo flow
(node2vec/src/main.py with its defaults: d=128, 10 walks x len 80,
window 10, 10 epochs, p=q=0.25 per the __main__ grid default)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

import graphtpu
from graphtpu.core.config import SGNSConfig, WalkConfig
from graphtpu.pipelines import node2vec_pipeline


def main():
    g = graphtpu.read_edgelist_graph(
        "/root/reference/node2vec/graph/karate.edgelist", n_nodes=35
    )
    t0 = time.time()
    emb = node2vec_pipeline(
        g,
        walk_cfg=WalkConfig(num_walks=10, walk_length=80, p=0.25, q=0.25),
        # subsample=0: gensim's default 1e-3 deletes ~78% of a 34-token
        # uniform-frequency corpus (every node has f ~ 1/34 >> 1e-3) and
        # collapses the embedding — the reference's shipped karate.emb is
        # near-init noise for exactly this reason.  BlogCatalog-scale
        # corpora (f ~ 1e-4) are unaffected.
        sgns_cfg=SGNSConfig(dim=128, window=10, epochs=10, subsample=0),
        output="/tmp/karate.emb",
    )
    print(f"pipeline: {time.time() - t0:.1f}s, emb {emb.shape}")
    # sanity: neighbours should be more similar than non-neighbours
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = e @ e.T
    rp, col = np.asarray(g.row_ptr), np.asarray(g.col)
    edge_sims, non_sims = [], []
    rng = np.random.default_rng(0)
    for u in range(1, 35):
        for v in col[rp[u] : rp[u + 1]]:
            edge_sims.append(sims[u, v])
        for v in rng.integers(1, 35, 4):
            if v not in col[rp[u] : rp[u + 1]] and v != u:
                non_sims.append(sims[u, v])
    print(f"mean cos(edge)={np.mean(edge_sims):.3f}  mean cos(non-edge)={np.mean(non_sims):.3f}")
    assert np.mean(edge_sims) > np.mean(non_sims) + 0.15
    print("OK: wrote /tmp/karate.emb")


if __name__ == "__main__":
    main()
