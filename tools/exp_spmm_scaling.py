"""Scaling evidence for ``sharded_simrank_spmm`` (VERDICT r3 #7).

Real multi-chip is unavailable (one tunnelled v5e), so this produces the
strongest available substitute, in three parts:

(a) ``--model``: the analytic per-device cost model — FLOPs, HBM bytes,
    ring bytes per iteration — instantiated at reference scales, with
    projected per-iter times from the measured single-chip streaming
    kernel (BENCH extras ``spmm_arxiv_gbps``).
(b) ``--cores``: pinned-core CPU measurement — the same V run on 1
    device with N cores vs 2 devices with 2N cores (equal cores per
    device), reporting parallel efficiency of the ring decomposition.
(c) ``--memory``: XLA compiled-memory analysis of the per-device
    footprint at a V where a replicated [V, V] would not fit a device's
    share — proving the O(V^2/n_dev) claim end-to-end from the compiled
    executable, not from source inspection.

Reference context: the 14-worker cluster gold runs
(``giraph/CombineBatchSingleWalkVertexReuse.java:297``); BASELINE.md's
">=90% scaling at 2 hosts" target.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def analytic_model(v, e_slots, n_dev, width=8, bytes_f32=4):
    """Per-device, per-ITERATION costs of the 1-D SUMMA SimRank.

    Two ring products per iteration; each product:
      * n_dev local tree applies, each over a [v, rows_per] column block:
        level-0 gathers e_slots/n_dev rows of rows_per floats + the
        accumulate, higher levels ~e_slots/(n_dev*width) rows;
      * n_dev - 1 ppermute hops shipping the [v, rows_per] block.
    HBM bytes per tree apply ~ 2 * (e_slots/n_dev) * rows_per * 4B
    (slot-row read + accumulate write at level 0 dominates; the tree
    tail adds ~1/width).  FLOPs: one multiply-add per slot element.
    """
    rows_per = v // n_dev
    tail = 1.0 / width  # deeper-level work relative to level 0
    per_apply_bytes = 2.0 * (e_slots / n_dev) * rows_per * bytes_f32 * (1 + tail)
    per_apply_flops = 2.0 * (e_slots / n_dev) * rows_per * (1 + tail)
    per_product = {
        "tree_apply_bytes": n_dev * per_apply_bytes,  # covers all v cols
        "tree_apply_flops": n_dev * per_apply_flops,
        "ring_bytes": (n_dev - 1) * v * rows_per * bytes_f32,
    }
    return {
        "V": v,
        "E_slots": e_slots,
        "n_dev": n_dev,
        "rows_per": rows_per,
        "s_block_bytes": v * rows_per * bytes_f32,
        "plan_bytes": int(e_slots / n_dev * (1 + tail)) * (4 + 4),
        "hbm_bytes_per_iter": 2 * per_product["tree_apply_bytes"],
        "flops_per_iter": 2 * per_product["tree_apply_flops"],
        "ring_bytes_per_iter": 2 * per_product["ring_bytes"],
    }


def analytic_model_2d(v, e_slots, r, c, width=8, bytes_wire=4):
    """Per-device, per-ITERATION costs of the 2-D SUMMA
    (``dist/spmm_summa.py``).  Two products per iteration; each product:
      * r ring steps; each applies the local [V/r, V/c] block plan
        (e_slots/n slots) against the [V/c, V/r] block in hand;
      * ring bytes: (r-1) shifts of the V²/n block along "pr";
      * reduce bytes: r psum_scatters of the [V/r, V/r] partial along
        "pc" (~(c-1)/c of the block each);
      * one all_to_all layout transpose (~V²/n per device).
    ``bytes_wire``: 4 (f32) or 2 (fast16 bf16 iterates — every wire in
    the 2-D form carries the block dtype).
    """
    n = r * c
    tail = 1.0 / width
    per_apply_bytes = 2.0 * (e_slots / n) * (v // r) * 4 * (1 + tail)
    per_apply_flops = 2.0 * (e_slots / n) * (v // r) * (1 + tail)
    ring = (r - 1) * (v // c) * (v // r) * bytes_wire
    reduce = r * (v // r) * (v // r) * bytes_wire * (c - 1) / c
    a2a = (v // c) * (v // r) * bytes_wire * (c - 1) / c
    return {
        "V": v,
        "E_slots": e_slots,
        "grid": f"{r}x{c}",
        "n_dev": n,
        "bytes_wire": bytes_wire,
        "s_block_bytes": (v // c) * (v // r) * bytes_wire,
        "hbm_bytes_per_iter": 2 * r * per_apply_bytes,
        "flops_per_iter": 2 * r * per_apply_flops,
        "ring_bytes_per_iter": 2 * (ring + reduce + a2a),
        # the "pr" ring and the "pc" reduce/transpose ride DISJOINT
        # physical links on a 2-D torus mapping — they overlap, so the
        # wire time is the max of the two axes, not the sum
        "bytes_axis_pr_per_iter": 2 * ring,
        "bytes_axis_pc_per_iter": 2 * (reduce + a2a),
    }


def run_model():
    # instantiate at arxiv scale (the measured single-chip workload) and
    # at the 14-worker cluster shape
    rows = []
    for v, e, n in [
        (38912, 667966, 1),
        (38912, 667966, 8),
        (1048576, 8 * 1048576, 8),
        (10027008, 8 * 10027008, 16),
    ]:
        m = analytic_model(v, e, n)
        rows.append(m)
        print(json.dumps(m))
    # 2-D SUMMA at the same shapes, f32 and fast16 wires
    for v, e, r, c in [
        (1048576, 8 * 1048576, 4, 2),
        (1048576, 8 * 1048576, 2, 4),
        (10027008, 8 * 10027008, 4, 4),
    ]:
        for bw in (4, 2):
            m = analytic_model_2d(v, e, r, c, bytes_wire=bw)
            rows.append(m)
            print(json.dumps(m))
    # projection: measured single-chip streaming kernel GB/s (from BENCH
    # extras spmm_arxiv_gbps; pass via env to avoid stale constants)
    gbps = float(os.environ.get("GRAPHTPU_MEASURED_GBPS", 0) or 0)
    ici_gbps = float(os.environ.get("GRAPHTPU_ICI_GBPS", 45))  # v5e 1 link
    if gbps:
        for m in rows:
            t_hbm = m["hbm_bytes_per_iter"] / (gbps * 1e9)
            if "bytes_axis_pr_per_iter" in m:
                # 2-D torus: per-axis links are disjoint -> overlap
                t_ring = max(
                    m["bytes_axis_pr_per_iter"], m["bytes_axis_pc_per_iter"]
                ) / (ici_gbps * 1e9)
            else:
                t_ring = m["ring_bytes_per_iter"] / (ici_gbps * 1e9)
            print(
                json.dumps({
                    "V": m["V"], "n_dev": m["n_dev"],
                    "grid": m.get("grid", "1d"),
                    "bytes_wire": m.get("bytes_wire", 4),
                    "t_hbm_s": round(t_hbm, 3),
                    "t_ring_s": round(t_ring, 3),
                    "projected_iter_s": round(max(t_hbm, t_ring), 3),
                    "comm_compute_ratio": round(t_ring / max(t_hbm, 1e-9), 3),
                })
            )


_CHILD = """
import os, sys, time
import numpy as np
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=%s "
    "--xla_cpu_multi_thread_eigen=true" % sys.argv[1]
)
import jax
jax.config.update("jax_platforms", "cpu")
import graphtpu
from graphtpu.core.config import SimRankConfig
from graphtpu.dist.mesh import make_1d_mesh
from graphtpu.dist.spmm_sharded import sharded_simrank_spmm

n_dev = int(sys.argv[1]); v = int(sys.argv[2]); iters = int(sys.argv[3])
rng = np.random.default_rng(0)
e = 8 * v
edges = rng.integers(0, v, size=(e, 2))
edges = edges[edges[:, 0] != edges[:, 1]]
ring = np.stack([np.arange(v), (np.arange(v) + 1) % v], 1)
g = graphtpu.build_graph(np.concatenate([edges, ring]), n_nodes=v)
mesh = make_1d_mesh(n_dev)
t0 = time.time()
s = sharded_simrank_spmm(g, mesh, SimRankConfig(iterations=1))
jax.block_until_ready(s)
compile_s = time.time() - t0
t0 = time.time()
s = sharded_simrank_spmm(g, mesh, SimRankConfig(iterations=iters))
jax.block_until_ready(s)
per_iter = (time.time() - t0 - 0.0) / iters
print("RESULT", n_dev, per_iter)
"""


def run_cores(v=4096, iters=4, cores_per_dev=1):
    """1 dev x N cores vs 2 dev x 2N cores: equal cores per device, so a
    perfect decomposition gives equal per-iter time (efficiency = t1/t2)."""
    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = _CHILD.format(repo=repo)
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(src)
        child = f.name
    out = {}
    for n_dev in (1, 2):
        n_cores = cores_per_dev * n_dev
        cpus = ",".join(str(c) for c in range(n_cores))
        cp = subprocess.run(
            ["taskset", "-c", cpus, sys.executable, child,
             str(n_dev), str(v), str(iters)],
            capture_output=True, text=True, timeout=1800,
        )
        for line in cp.stdout.splitlines():
            if line.startswith("RESULT"):
                _, nd, per = line.split()
                out[int(nd)] = float(per)
                print(f"n_dev={nd} cores={n_cores}: {float(per)*1e3:.0f} ms/iter",
                      flush=True)
        if cp.returncode != 0 and not out.get(n_dev):
            print(cp.stderr[-2000:], flush=True)
    if 1 in out and 2 in out:
        eff = out[1] / out[2]
        print(json.dumps({
            "V": v, "iters": iters, "cores_per_dev": cores_per_dev,
            "per_iter_1dev_s": round(out[1], 3),
            "per_iter_2dev_s": round(out[2], 3),
            "weak_scaling_efficiency": round(eff, 3),
        }))
    os.unlink(child)


def run_memory(v=16384, n_dev=8):
    """Compile the iteration at a V whose full [V, V] iterate (1 GiB at
    V=16384) is n_dev x the per-device share; report XLA's compiled
    per-device memory analysis and assert the O(V^2/n_dev) ceiling."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import graphtpu
    from graphtpu.core.config import SimRankConfig
    from graphtpu.dist.mesh import make_1d_mesh
    from graphtpu.dist.spmm_sharded import (
        build_sharded_tree_plan,
        sharded_simrank_spmm,
    )

    from graphtpu.dist.spmm_sharded import make_sharded_iter

    rng = np.random.default_rng(0)
    e = 8 * v
    edges = rng.integers(0, v, size=(e, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    ringe = np.stack([np.arange(v), (np.arange(v) + 1) % v], 1)
    g = graphtpu.build_graph(np.concatenate([edges, ringe]), n_nodes=v)
    mesh = make_1d_mesh(n_dev)

    plan, vv, init, run_n, zero_diag = make_sharded_iter(
        g, mesh, SimRankConfig(iterations=1)
    )
    lw = plan.levels + plan.weights
    s = init(jnp.zeros((n_dev,), jnp.float32))

    # the COMPILED executable's own memory analysis — per-device peak
    # from XLA's buffer assignment, not source inspection
    compiled = run_n.lower(s, 3, *lw).compile()
    ma = compiled.memory_analysis()
    full_bytes = vv * vv * 4
    share_bytes = vv * (vv // n_dev) * 4
    # argument + output + temps, all per device (host-count meshes
    # report per-device figures)
    peak = (
        ma.argument_size_in_bytes
        + ma.output_size_in_bytes
        + ma.temp_size_in_bytes
    )
    plan_bytes = sum(
        x.size * 4 // n_dev for x in lw
    )
    report = {
        "V": v, "n_dev": n_dev,
        "full_iterate_mib": round(full_bytes / 2**20, 1),
        "per_device_share_mib": round(share_bytes / 2**20, 1),
        "xla_argument_mib": round(ma.argument_size_in_bytes / 2**20, 1),
        "xla_output_mib": round(ma.output_size_in_bytes / 2**20, 1),
        "xla_temp_mib": round(ma.temp_size_in_bytes / 2**20, 1),
        "xla_peak_mib": round(peak / 2**20, 1),
        "plan_share_mib": round(plan_bytes / 2**20, 1),
        "peak_vs_full_iterate": round(peak / full_bytes, 3),
    }
    print(json.dumps(report))
    # run + check the result sharding really is the column block
    s = run_n(s, 3, *lw)
    shard_shapes = {tuple(sh.data.shape) for sh in s.addressable_shards}
    assert shard_shapes == {(vv, vv // n_dev)}, shard_shapes
    # the executable's per-device peak is O(V^2/n_dev) with a small
    # constant: S block in + out + ring double-buffers (y, block in
    # hand, ppermute recv) — measured 5.25 blocks at V=16384.  A
    # replicated-W design needs >= n_dev x this (2 full iterates per
    # device); assert the sharded form's constant stays bounded.
    assert peak < 6 * share_bytes + (64 << 20), (peak, share_bytes)

    # --- the 2-D SUMMA at the same V: per-device peak is also O(V²/n)
    # with its own constant (S block + in-hand block + strips + a2a
    # recv); the reduce/transpose collectives never materialise a
    # replicated iterate.
    from graphtpu.dist.spmm_summa import make_2d_mesh, make_summa_iter

    r = max(2, n_dev // 2)
    mesh2 = make_2d_mesh(r, n_dev // r)
    plan2, v2, init2, run_n2, _zero = make_summa_iter(
        g, mesh2, SimRankConfig(iterations=1)
    )
    lw2 = plan2.levels + plan2.weights
    s2 = init2(jnp.zeros((r, n_dev // r), jnp.float32))
    compiled2 = run_n2.lower(s2, 3, *lw2).compile()
    ma2 = compiled2.memory_analysis()
    peak2 = (
        ma2.argument_size_in_bytes
        + ma2.output_size_in_bytes
        + ma2.temp_size_in_bytes
    )
    share2 = v2 * v2 * 4 // n_dev
    report2 = {
        "V": v, "grid": f"{r}x{n_dev//r}",
        "xla_peak_mib": round(peak2 / 2**20, 1),
        "per_device_share_mib": round(share2 / 2**20, 1),
        "peak_vs_full_iterate": round(peak2 / (v2 * v2 * 4), 3),
    }
    print(json.dumps(report2))
    assert peak2 < 8 * share2 + (64 << 20), (peak2, share2)
    return report


if __name__ == "__main__":
    if "--model" in sys.argv or len(sys.argv) == 1:
        run_model()
    if "--cores" in sys.argv:
        run_cores()
    if "--memory" in sys.argv:
        run_memory()
