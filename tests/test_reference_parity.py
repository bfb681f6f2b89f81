"""Golden-file parity against outputs shipped inside the reference repo."""

import os

import numpy as np
import pytest

import graphtpu
from graphtpu.core.config import SimRankConfig
from graphtpu.io.simfile import read_sim_file
from graphtpu.eval.precision import precision_sim_dicts, ndcg_sim_dicts
from graphtpu.simrank.exact import exact_simrank

REF = "/root/reference"
GOLD = f"{REF}/IsoMap_LE/data/0_333_5038_simrank_navie_top10.txt.sim.txt"


@pytest.mark.skipif(not os.path.exists(GOLD), reason="reference data absent")
def test_exact_simrank_matches_reference_gold_file():
    """The reference repo ships the naive-SimRank top-10 of the 333-node
    graph (IsoMap_LE/data).  That file was produced by SimRank.java in its
    C=0.8 configuration (cf. giraph/SingleWalkVertex.java:36) run to
    convergence.  Our S = C * W^T S W matmul form must reproduce the
    *values* to float precision and the rankings almost exactly."""
    g = graphtpu.read_edgelist_graph(
        f"{REF}/IsoMap_LE/data/0_333_5038.txt", n_nodes=333
    )
    gold = read_sim_file(GOLD)
    sim = np.asarray(exact_simrank(g, SimRankConfig(c=0.8, iterations=30)))
    mine = {
        v: [(int(i), float(sim[v, i])) for i in np.argsort(-sim[v])[:10]]
        for v in range(333)
    }
    p = precision_sim_dicts(gold, mine, k=10)
    assert p > 0.99, p
    n = ndcg_sim_dicts(gold, mine, k=10)
    assert n > 0.999, n
    # value-level agreement on every top-1 entry
    for v in range(333):
        if gold[v]:
            assert abs(mine[v][0][1] - gold[v][0][1]) < 1e-6
