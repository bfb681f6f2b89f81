"""DeepSim end-to-end pipeline — ``DeepSim/src/main.py`` as a function.

Flow (``main.py:262-289``): read the Java engines' ``.sim.txt`` output
(file boundary), load-or-generate node2vec walks with a ``walks.txt``
cache (``main.py:274-278``), run the pre-training diagnostics, train the
DeepSim AE, and hand embeddings to the classification protocol.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from graphtpu.core.config import DeepSimConfig, WalkConfig
from graphtpu.core.graph import Graph
from graphtpu.io.simfile import read_sim_file
from graphtpu.models.deepsim import build_sim_table, train_deepsim
from graphtpu.walks.walker import simulate_walks, walks_to_corpus


def read_simrank(path: str, min_sim: float = 1e-8) -> Dict[int, List[Tuple[int, float]]]:
    """Parse a .sim.txt and drop sims <= min_sim (``main.py:83-107``)."""
    raw = read_sim_file(path)
    return {
        src: [(i, v) for i, v in pairs if v > min_sim]
        for src, pairs in raw.items()
    }


def save_walks(path: str, walks: np.ndarray) -> None:
    """walks.txt cache format: space-separated node ids per line
    (``main.py:237-243``)."""
    with open(path, "w") as f:
        for row in walks_to_corpus(walks):
            f.write(" ".join(str(x) for x in row) + "\n")


def load_walks(path: str, walk_length: int) -> np.ndarray:
    rows = []
    with open(path) as f:
        for line in f:
            toks = [int(t) for t in line.split()]
            toks = toks[:walk_length] + [-1] * max(0, walk_length - len(toks))
            rows.append(toks)
    return np.asarray(rows, np.int32)


def simrank_label_agreement(
    sim_dict: Dict[int, List[Tuple[int, float]]],
    labels: Sequence[Sequence[int]],
    topk: int = 10,
) -> float:
    """Diagnostic: fraction of top-k sim pairs sharing >= 1 label
    (``preprocess_simrank``, ``main.py:132-167``)."""
    hits, total = 0, 0
    for src, pairs in sim_dict.items():
        if src >= len(labels) or not labels[src]:
            continue
        ls = set(labels[src])
        for dst, _ in pairs[:topk]:
            if dst >= len(labels):
                continue
            total += 1
            if ls & set(labels[dst]):
                hits += 1
    return hits / total if total else 0.0


def edge_label_homophily(g: Graph, labels: Sequence[Sequence[int]]) -> float:
    """Diagnostic: fraction of edges whose endpoints share a label
    (``preprocess_edges``, ``main.py:169-191``)."""
    rp = np.asarray(g.row_ptr)
    col = np.asarray(g.col)
    hits, total = 0, 0
    for u in range(g.n_nodes):
        if u >= len(labels) or not labels[u]:
            continue
        lu = set(labels[u])
        for v in col[rp[u] : rp[u + 1]]:
            if v <= u or v >= len(labels):
                continue
            total += 1
            if lu & set(labels[v]):
                hits += 1
    return hits / total if total else 0.0


def deepsim_pipeline(
    g: Graph,
    simrank_path: str,
    cfg: DeepSimConfig = DeepSimConfig(),
    walk_cfg: WalkConfig = WalkConfig(),
    walks_cache: Optional[str] = None,
    seed: int = 0,
    steps: Optional[int] = None,
) -> np.ndarray:
    """Returns [V, dim] embeddings (= W1)."""
    sim_dict = read_simrank(simrank_path)
    table = build_sim_table(sim_dict, g.n_nodes)
    if walks_cache and os.path.exists(walks_cache):
        walks = load_walks(walks_cache, walk_cfg.walk_length)
    else:
        walks = np.asarray(
            simulate_walks(
                g,
                num_walks=walk_cfg.num_walks,
                walk_length=walk_cfg.walk_length,
                key=jax.random.key(seed),
                p=walk_cfg.p,
                q=walk_cfg.q,
            )
        )
        if walks_cache:
            save_walks(walks_cache, walks)
    return train_deepsim(
        walks, table, g.n_nodes, cfg, key=jax.random.key(seed + 1), steps=steps
    )
