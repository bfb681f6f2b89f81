"""Top-k precision and NDCG — ``utils/Eval.java`` semantics.

Two comparison modes used by every reference benchmark driver:

* :func:`precision_sim_dicts` — score-aware precision
  (``Eval.java:81-140``): per source, gold ids with sim >= MIN form set1
  (the gold file holds top-1000, ``Print.printByOrderAll``), approx ids
  with sim >= MIN form set2, realK = min(TOPK, |set1|), precision =
  |set1 & set2| / realK (1.0 when realK == 0); report the mean over
  sources.

* :func:`precision_at_k` — plain id-list overlap at k
  (``Eval.java:16-79`` on the ids-only ``.txt`` files).

* :func:`ndcg_sim_dicts` — NDCG@k against exact scores
  (``Eval.java:257-291``): DCG_i = 2^score_i * ln2 / ln(i+1) over 1-based
  list positions, ndcg = DCG(approx)/DCG(gold), averaged over sources.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

from graphtpu.core.config import MIN_SIM, TOPK

SimDict = Dict[int, List[Tuple[int, float]]]


def precision_at_k(
    gold_ids: Dict[int, List[int]],
    approx_ids: Dict[int, List[int]],
    k: int = TOPK,
) -> float:
    """Mean per-source |gold[:k] & approx[:k]| / k' (ids-only variant)."""
    total, s = 0, 0.0
    for src, gold in gold_ids.items():
        if src not in approx_ids:
            continue
        maxc = min(k, len(gold))
        if maxc == 0:
            continue
        g = set(gold[:maxc])
        a = set(approx_ids[src][:maxc])
        s += len(g & a) / maxc
        total += 1
    return s / total if total else 0.0


def precision_sim_dicts(
    gold: SimDict,
    approx: SimDict,
    k: int = TOPK,
    min_sim: float = MIN_SIM,
) -> float:
    total, s = 0.0, 0.0
    for src, gpairs in gold.items():
        apairs = approx.get(src, [])
        set1 = {i for i, v in gpairs if v >= min_sim}
        set2 = {i for i, v in apairs if v >= min_sim}
        real_k = min(k, len(set1))
        pre = 1.0 if real_k == 0 else len(set1 & set2) / real_k
        s += pre
        total += 1
    return s / total if total else 0.0


def _dcg(scores: Sequence[float]) -> float:
    # Eval.java:268-272: positions are 1-based, i starts at the first
    # neighbour token -> discount ln2/ln(i+1), i = 1..len
    return sum(
        (2.0 ** sc) * math.log(2) / math.log(i + 1)
        for i, sc in enumerate(scores, start=1)
    )


def ndcg_sim_dicts(gold: SimDict, approx: SimDict, k: int = TOPK) -> float:
    total, s = 0.0, 0.0
    for src, gpairs in gold.items():
        apairs = approx.get(src, [])
        n = min(len(gpairs), len(apairs), k)
        if n == 0:
            continue
        zk = _dcg([v for _, v in gpairs[:n]])
        appk = _dcg([v for _, v in apairs[:n]])
        if zk <= 0:
            continue
        s += appk / zk
        total += 1
    return s / total if total else 0.0
