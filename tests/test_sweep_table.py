"""The committed gold-sweep QA tables (results/sweeps_r*.jsonl) must show
the MC estimators converging toward the 30-iter gold standard with budget
— the reference's entire quality regime
(``benchmark/Test_u_u_TopSim_singleSample.java:17-64``,
``utils/Eval.java:81-140,257-291``; round-4 adds the doubleRandomWalk /
TopSim_doubleSample / TopSim_Dev families from their ``Test_u_u_*``
drivers).  Tables are produced on the real TPU by ``tools/run_sweeps.py``
and committed; this test guards them.
"""

import glob
import json
import os

import pytest

RESULTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "results"
)


def _load():
    paths = sorted(glob.glob(os.path.join(RESULTS, "sweeps_r*.jsonl")))
    if not paths:
        pytest.skip("sweep tables not yet generated")
    by = {}
    for p in paths:
        for l in open(p):
            if not l.strip():
                continue
            r = json.loads(l)
            by.setdefault((r["dataset"], r["algorithm"]), {})[
                float(r["sample"])
            ] = r
    return by


def test_precision_converges_with_budget():
    by = _load()
    # every dataset x walk-engine sweep must reach >=0.93 precision@20 at
    # the top budget (round 3 achieved 0.946-0.985; the old >=0.9
    # max-over-datasets floor guarded catastrophe, not regression —
    # VERDICT r3 weak #7)
    for alg in ("uniwalk", "topsim_singleSample"):
        rows_per_ds = {
            ds: rows
            for (ds, a), rows in by.items()
            if a == alg and len(rows) >= 4
        }
        assert rows_per_ds, f"no completed sweeps for {alg}"
        for ds, rows in rows_per_ds.items():
            top = rows[max(rows)]["precision"]
            assert top >= 0.93, f"{ds}/{alg} top-budget precision {top}"


def test_precision_monotone_ish():
    by = _load()
    for (ds, alg), rows in by.items():
        if len(rows) < 3:
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
        if len(rows) < 3:
            continue
        top = rows[max(rows)]
        assert top["ndcg"] >= 0.8, (ds, alg, top)


def test_round4_engine_families_present():
    """The doubleRandomWalk / doubleSample / Dev families must have
    committed sweep rows on the dense-range datasets (VERDICT r3 #4)."""
    by = _load()
    have = {a for (_, a) in by}
    if not {"doubleRandomWalk", "topsim_doubleSample", "topsim_dev"} & have:
        pytest.skip("round-4 sweep table not yet generated")
    for alg, n_min in (
        ("doubleRandomWalk", 4),
        ("topsim_doubleSample", 3),
        ("topsim_dev", 1),
    ):
        ds_done = [ds for (ds, a), rows in by.items()
                   if a == alg and len(rows) >= n_min]
        assert ds_done, f"no committed {alg} sweep"

    # the two step-1 estimators converge to the same limit (the sampled
    # endpoint-mass product): their top-budget precision must agree
    for ds in {ds for (ds, a) in by if a == "doubleRandomWalk"}:
        dw = by.get((ds, "doubleRandomWalk"))
        dsamp = by.get((ds, "topsim_doubleSample"))
        if not dw or not dsamp:
            continue
        p1 = dw[max(dw)]["precision"]
        p2 = dsamp[max(dsamp)]["precision"]
        assert abs(p1 - p2) < 0.08, (ds, p1, p2)

    # Dev's verified candidates must sit at the dataset's own
    # step-truncation plateau — i.e. match topsim_singleSample at the
    # same budget (Dev re-ranks phase-1 candidates, so it cannot beat
    # them; a large deficit would mean the meeting-score verification is
    # broken).  blog's plateau is ~0.88, moreno's ~0.984.
    for (ds, a), rows in by.items():
        if a != "topsim_dev":
            continue
        single = by.get((ds, "topsim_singleSample"))
        assert single, f"no singleSample anchor for {ds}"
        anchor = single[min(single, key=lambda s: abs(s - max(rows)))]
        p_dev = rows[max(rows)]["precision"]
        assert p_dev >= anchor["precision"] - 0.02, (ds, p_dev, anchor)


def _load_rows():
    paths = sorted(glob.glob(os.path.join(RESULTS, "sweeps_r*.jsonl")))
    rows = []
    for p in paths:
        for l in open(p):
            if l.strip():
                rows.append(json.loads(l))
    return rows


def test_full_v_estimator_validation():
    """The 2048-source estimation subset must agree with a committed
    FULL-V sweep within sampling error (VERDICT r3 #6).  moreno_crime
    (V=1380 < 2048) is always full-V; the contrast dataset is blog
    (V=10496): rows with n_sources == 10496 vs the 2048-source rows at
    the same (algorithm, sample).  2*SE of a 2048-source precision
    estimate is ~0.022; allow 0.035 for the two runs' independent MC
    noise."""
    rows = _load_rows()
    full = {
        (r["algorithm"], float(r["sample"])): r["precision"]
        for r in rows
        if r["dataset"] == "blog" and r.get("n_sources", 2048) >= 10496
    }
    if not full:
        pytest.skip("full-V blog sweep not yet committed")
    subset = {
        (r["algorithm"], float(r["sample"])): r["precision"]
        for r in rows
        if r["dataset"] == "blog" and r.get("n_sources", 2048) == 2048
    }
    checked = 0
    for k, p_full in full.items():
        if k in subset:
            assert abs(p_full - subset[k]) <= 0.035, (k, p_full, subset[k])
            checked += 1
    assert checked > 0, "no overlapping (algorithm, sample) points"
