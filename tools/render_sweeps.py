"""Render results/sweeps_r*.jsonl into the RESULTS markdown tables.

Usage: python tools/render_sweeps.py [pattern ...]
"""

import glob
import json
import os
import sys

RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results")


def main():
    rows = []
    pats = sys.argv[1:] or ["sweeps_r*.jsonl"]
    for pat in pats:
        for p in sorted(glob.glob(os.path.join(RESULTS, pat))):
            for l in open(p):
                if l.strip():
                    rows.append(json.loads(l))
    by = {}
    for r in rows:
        key = (r["dataset"], r["algorithm"], r.get("n_sources"))
        by.setdefault(key, {})[float(r["sample"])] = r
    for (ds, alg, ns), samples in sorted(by.items()):
        ss = sorted(samples)
        head = " | ".join(f"{int(s)}" for s in ss)
        prec = " | ".join(f"{samples[s]['precision']:.3f}" for s in ss)
        ndcg = " | ".join(f"{samples[s]['ndcg']:.2f}" for s in ss)
        secs = " | ".join(f"{samples[s]['seconds']:.0f}" for s in ss)
        print(f"### {ds} / {alg} (n_sources={ns})")
        print(f"| sample | {head} |")
        print(f"|---|{'---|' * len(ss)}")
        print(f"| precision@20 | {prec} |")
        print(f"| NDCG@20 | {ndcg} |")
        print(f"| seconds | {secs} |")
        print()


if __name__ == "__main__":
    main()
