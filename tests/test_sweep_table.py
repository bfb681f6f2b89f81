"""The committed gold-sweep QA table (results/sweeps_r3.jsonl) must show
the MC estimators converging toward the 30-iter gold standard with budget
— the reference's entire quality regime
(``benchmark/Test_u_u_TopSim_singleSample.java:17-64``,
``utils/Eval.java:81-140,257-291``).  The table is produced on the real
TPU by ``tools/run_sweeps.py`` and committed; this test guards it.
"""

import json
import os

import pytest

TABLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "results",
    "sweeps_r3.jsonl",
)


def _load():
    if not os.path.exists(TABLE):
        pytest.skip("sweep table not yet generated")
    rows = [json.loads(l) for l in open(TABLE) if l.strip()]
    by = {}
    for r in rows:
        by.setdefault((r["dataset"], r["algorithm"]), {})[float(r["sample"])] = r
    return by


def test_precision_converges_with_budget():
    by = _load()
    # at least one real dataset must reach >=0.9 precision@20 at the top
    # budget for both engine families (VERDICT r2 #1 acceptance bar)
    for alg in ("uniwalk", "topsim_singleSample"):
        tops = [
            rows[max(rows)]["precision"]
            for (ds, a), rows in by.items()
            if a == alg and len(rows) >= 4
        ]
        assert tops, f"no completed sweeps for {alg}"
        assert max(tops) >= 0.9, f"{alg} never reaches 0.9 precision: {tops}"


def test_precision_monotone_ish():
    by = _load()
    for (ds, alg), rows in by.items():
        if len(rows) < 4:
            continue
        samples = sorted(rows)
        ps = [rows[s]["precision"] for s in samples]
        # monotone-ish: the best budget beats the smallest, and no step
        # drops more than MC noise (5 points)
        assert ps[-1] >= ps[0], (ds, alg, ps)
        for a, b in zip(ps, ps[1:]):
            assert b >= a - 0.05, (ds, alg, ps)


def test_ndcg_high_at_top_budget():
    by = _load()
    for (ds, alg), rows in by.items():
        if len(rows) < 4:
            continue
        top = rows[max(rows)]
        assert top["ndcg"] >= 0.8, (ds, alg, top)
