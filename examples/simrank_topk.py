"""Exact SimRank top-k on the reference 333-node graph, end-to-end:
graph -> S = C W^T S W -> Print.printByOrder twin files -> Eval precision
against the reference's own shipped gold output."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import graphtpu
from graphtpu.core.config import SimRankConfig
from graphtpu.eval.precision import ndcg_sim_dicts, precision_sim_dicts
from graphtpu.io.simfile import read_sim_file, write_topk_files
from graphtpu.kernels.topk import topk_rows
from graphtpu.simrank.exact import exact_simrank
from graphtpu.utils.logging import StopWatch


def main():
    StopWatch.start()
    g = graphtpu.read_edgelist_graph(
        "/root/reference/IsoMap_LE/data/0_333_5038.txt", n_nodes=333
    )
    StopWatch.say(f"graph: V={g.n_nodes} slots={g.n_edges}")
    # the shipped gold file is from the reference's C=0.8 era, converged
    sim = exact_simrank(g, SimRankConfig(c=0.8, iterations=30))
    StopWatch.say("simrank computed")
    import jax.numpy as jnp

    vals, idx = topk_rows(jnp.asarray(sim), 10)
    ids_path, sim_path = write_topk_files(
        "/tmp/0_333_simrank_top10.txt", np.asarray(idx), np.asarray(vals),
        precision=8,
    )
    StopWatch.say(f"wrote {ids_path} and {sim_path}")
    gold = read_sim_file(
        "/root/reference/IsoMap_LE/data/0_333_5038_simrank_navie_top10.txt.sim.txt"
    )
    mine = read_sim_file(sim_path)
    p = precision_sim_dicts(gold, mine, k=10)
    n = ndcg_sim_dicts(gold, mine, k=10)
    StopWatch.say(f"precision@10 vs reference gold: {p:.4f}  NDCG: {n:.4f}")
    assert p > 0.99 and n > 0.999
    print("OK")


if __name__ == "__main__":
    main()
