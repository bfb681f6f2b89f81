"""Command-line interface — the reference argparse entry points unified.

``python -m graphtpu node2vec ...`` mirrors ``node2vec/src/main.py:20-73``
(same flags and defaults, including --p/--q and the weighted/directed
toggles); ``simrank`` / ``uniwalk`` / ``topsim`` expose the Java engines;
``deepsim`` mirrors ``DeepSim/src/main.py:18-80``; ``sweep`` runs the
``Test_u_u_*`` gold-standard protocol.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="graphtpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    n2v = sub.add_parser("node2vec", help="node2vec walks + SGNS -> .emb")
    n2v.add_argument("--input", required=True)
    n2v.add_argument("--output", required=True)
    n2v.add_argument("--dimensions", type=int, default=128)
    n2v.add_argument("--walk-length", type=int, default=80)
    n2v.add_argument("--num-walks", type=int, default=10)
    n2v.add_argument("--window-size", type=int, default=10)
    n2v.add_argument("--iter", type=int, default=10)
    n2v.add_argument("--p", type=float, default=1.0)
    n2v.add_argument("--q", type=float, default=1.0)
    n2v.add_argument("--weighted", action="store_true")
    n2v.add_argument("--directed", action="store_true")
    n2v.add_argument("--delimiter", default=None)
    n2v.add_argument("--seed", type=int, default=0)
    n2v.add_argument("--subsample", type=float, default=1e-3)
    # the reference __main__ sweeps a p=q grid writing one .emb per setting
    # (node2vec/src/main.py:117-128); --grid "0.25,0.5,1,2,4" does the same
    n2v.add_argument("--grid", default=None)

    sr = sub.add_parser("simrank", help="exact SimRank -> top-k .sim.txt")
    sr.add_argument("--input", required=True)
    sr.add_argument("--output", required=True)
    sr.add_argument("--c", type=float, default=0.6)
    sr.add_argument("--iterations", type=int, default=3)
    sr.add_argument("--topk", type=int, default=20)
    sr.add_argument("--weighted", action="store_true")
    sr.add_argument("--delimiter", default=None)

    uw = sub.add_parser("uniwalk", help="single-walk MC SimRank")
    uw.add_argument("--input", required=True)
    uw.add_argument("--output", required=True)
    uw.add_argument("--sample", type=int, default=10000)
    uw.add_argument("--step", type=int, default=5)
    uw.add_argument("--topk", type=int, default=20)
    uw.add_argument("--delimiter", default=None)

    ts = sub.add_parser("topsim", help="TopSim deterministic spreading")
    ts.add_argument("--input", required=True)
    ts.add_argument("--output", required=True)
    ts.add_argument("--sample", type=float, default=10000.0)
    ts.add_argument("--step", type=int, default=3)
    ts.add_argument("--topk", type=int, default=20)
    ts.add_argument("--delimiter", default=None)

    ds = sub.add_parser("deepsim", help="DeepSim AE over .sim.txt targets")
    ds.add_argument("--input", required=True)
    ds.add_argument("--simrank-path", required=True)
    ds.add_argument("--emb-output", required=True)
    ds.add_argument("--dimensions", type=int, default=128)
    ds.add_argument("--window-size", type=int, default=10)
    ds.add_argument("--vertex-num", type=int, default=0)
    ds.add_argument("--steps", type=int, default=50000)
    ds.add_argument("--walks-cache", default=None)
    ds.add_argument("--delimiter", default=None)

    sw = sub.add_parser("sweep", help="gold-standard precision sweep")
    sw.add_argument("--input", required=True)
    sw.add_argument("--log", required=True)
    sw.add_argument("--algorithm", choices=["uniwalk", "topsim"], default="uniwalk")
    sw.add_argument("--samples", type=int, nargs="+", default=None)
    sw.add_argument("--delimiter", default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import graphtpu

    if args.cmd == "node2vec":
        from graphtpu.core.config import SGNSConfig, WalkConfig
        from graphtpu.pipelines import node2vec_pipeline

        g = graphtpu.read_edgelist_graph(
            args.input, delimiter=args.delimiter,
            weighted=args.weighted, directed=args.directed,
        )
        if args.directed:
            g = g.out
        if args.grid:
            pqs = [(float(x), float(x)) for x in args.grid.split(",")]
        else:
            pqs = [(args.p, args.q)]
        for p, q in pqs:
            out = (
                args.output
                if len(pqs) == 1
                else f"{args.output}.p{p:g}_q{q:g}.emb"
            )
            node2vec_pipeline(
                g,
                walk_cfg=WalkConfig(
                    num_walks=args.num_walks, walk_length=args.walk_length,
                    p=p, q=q,
                ),
                sgns_cfg=SGNSConfig(
                    dim=args.dimensions, window=args.window_size,
                    epochs=args.iter, subsample=args.subsample, seed=args.seed,
                ),
                seed=args.seed,
                output=out,
            )
            print(f"wrote {out}")
        return 0

    g = graphtpu.read_edgelist_graph(
        args.input, delimiter=getattr(args, "delimiter", None),
        weighted=getattr(args, "weighted", False),
    )

    if args.cmd == "simrank":
        import jax.numpy as jnp

        from graphtpu.core.config import SimRankConfig
        from graphtpu.io.simfile import write_topk_files
        from graphtpu.kernels.topk import topk_rows
        from graphtpu.simrank.exact import exact_simrank

        sim = exact_simrank(
            g, SimRankConfig(c=args.c, iterations=args.iterations),
            weighted=args.weighted,
        )
        vals, idx = topk_rows(jnp.asarray(sim), args.topk)
        write_topk_files(args.output, np.asarray(idx), np.asarray(vals))
        print(f"wrote {args.output}(.sim.txt)")
        return 0

    if args.cmd == "uniwalk":
        from graphtpu.core.config import UniWalkConfig
        from graphtpu.io.simfile import write_topk_files
        from graphtpu.simrank.uniwalk import uniwalk_simrank

        vals, idx = uniwalk_simrank(
            g, UniWalkConfig(sample=args.sample, step=args.step, topk=args.topk)
        )
        write_topk_files(args.output, idx, vals)
        print(f"wrote {args.output}(.sim.txt)")
        return 0

    if args.cmd == "topsim":
        from graphtpu.core.config import TopSimConfig
        from graphtpu.io.simfile import write_topk_files
        from graphtpu.simrank.topsim import topsim_simrank

        vals, idx = topsim_simrank(
            g, TopSimConfig(sample=args.sample, step=args.step, topk=args.topk)
        )
        write_topk_files(args.output, idx, vals)
        print(f"wrote {args.output}(.sim.txt)")
        return 0

    if args.cmd == "deepsim":
        from graphtpu.core.config import DeepSimConfig, WalkConfig
        from graphtpu.io.embfile import write_emb
        from graphtpu.pipelines_deepsim import deepsim_pipeline

        emb = deepsim_pipeline(
            g,
            simrank_path=args.simrank_path,
            cfg=DeepSimConfig(dim=args.dimensions, window=args.window_size),
            walk_cfg=WalkConfig(),
            walks_cache=args.walks_cache,
            steps=args.steps,
        )
        write_emb(args.emb_output, emb)
        print(f"wrote {args.emb_output}")
        return 0

    if args.cmd == "sweep":
        from graphtpu.bench.sweep import (
            REFERENCE_SAMPLE_GRID,
            gold_standard,
            sweep_topsim,
            sweep_uniwalk,
        )
        from graphtpu.utils.logging import Log

        gold = gold_standard(g)
        samples = args.samples or REFERENCE_SAMPLE_GRID
        with Log(args.log) as log:
            if args.algorithm == "uniwalk":
                res = sweep_uniwalk(g, gold, samples=samples, log=log)
            else:
                res = sweep_topsim(g, gold, samples=samples, log=log)
        for r in res:
            print(f"{r.algorithm} sample={r.sample}: precision={r.precision:.4f} "
                  f"ndcg={r.ndcg:.4f} ({r.seconds:.1f}s)")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
