import json
import os

import jax
import numpy as np

from graphtpu.bench.generators import (
    bipartite_random_graph,
    massive_bipartite_graph,
    rmat_graph,
    uniform_random_graph,
)
from graphtpu.dist.windows import read_sweep_results, windowed_topk_sweep
from graphtpu.utils.logging import Log, StopWatch
from graphtpu.utils.metrics import StepMetrics


def test_windowed_sweep_and_resume(tmp_path):
    out_dir = str(tmp_path / "sweep")
    calls = []

    def tile(sources, key):
        calls.append((sources[0], sources[-1]))
        vals = np.tile(np.array([[0.9, 0.5]], np.float32), (len(sources), 1))
        idx = np.stack([sources + 1, sources + 2], axis=1).astype(np.int32)
        return vals, idx

    windowed_topk_sweep(tile, n_sources=10, out_dir=out_dir, window=4)
    assert calls == [(0, 3), (4, 7), (8, 9)]
    res = read_sweep_results(out_dir)
    assert len(res) == 10
    assert res[3][0] == (4, 0.9)

    # simulate a crash after the first window: rewind the checkpoint
    with open(os.path.join(out_dir, "checkpoint.json"), "w") as f:
        json.dump({"next_window_start": 4, "n_sources": 10}, f)
    calls.clear()
    windowed_topk_sweep(tile, n_sources=10, out_dir=out_dir, window=4)
    assert calls == [(4, 7), (8, 9)]  # resumed, window 0 not recomputed


def test_step_metrics(tmp_path):
    m = StepMetrics()
    with m.step("a", bytes=10):
        pass
    m.record("b", 2.0)
    assert m.steps[0]["step"] == "a" and m.steps[0]["bytes"] == 10
    assert m.total_seconds() >= 2.0
    assert m.bucket_histogram(1.0)[2] == 1
    p = str(tmp_path / "m.jsonl")
    m.dump(p)
    assert len(open(p).readlines()) == 2


def test_log_and_stopwatch(tmp_path):
    p = str(tmp_path / "x.log")
    with Log(p) as log:
        log.info("hello")
    line = open(p).read()
    assert "DURATION" in line and "hello" in line
    StopWatch.start()
    assert StopWatch.elapsed() < 1.0


def test_generators_shapes_and_ranges():
    e = uniform_random_graph(100, 6, seed=1)
    assert (e[:, 0] != e[:, 1]).all() and e.max() < 100
    b = bipartite_random_graph(50, 30, 4, seed=1)
    assert b[:, 0].max() < 50 and b[:, 1].min() >= 50 and b[:, 1].max() < 80
    r = rmat_graph(8, 2000, seed=1)
    assert r.max() < 256
    # power-law-ish: the busiest vertex should far exceed the mean degree
    deg = np.bincount(np.concatenate([r[:, 0], r[:, 1]]), minlength=256)
    assert deg.max() > 4 * max(deg.mean(), 1)


def test_massive_bipartite_dedup(tmp_path):
    p = str(tmp_path / "big.txt")
    n = massive_bipartite_graph(1000, 1000, 4, p, chunk=1500)
    lines = open(p).read().strip().split("\n")
    assert len(lines) == n
    assert len(set(lines)) == n  # exact dedup
    assert n == 1000 * 2 * 4 // 2
