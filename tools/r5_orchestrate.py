"""Patient member-cycling driver for tools/r5_tpu_batch.py.

Pool members recover on their own schedule (~30-60 min after their last
client dies; a recycled worker restarts with CLEAN HBM).  This loops
over members, launching the REAL batch each time (which opens with its
own in-process canary — no throwaway probes, CLAUDE.md protocol), until
every requested part has produced a result or the budget expires.

Usage: python tools/r5_orchestrate.py [budget_s] [part ...]
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(os.path.dirname(HERE), "results", "r5_batch.json")

PART_KEYS = {
    "f1": ["blogcatalog_f1"],
    "spmm": ["spmm_composed.spmm_arxiv_fast_ms_per_iter"],
    "fast16": ["fast16_vrange_demo"],
    "transpose": ["transpose_ms_v11264"],
    "transpose_arxiv": ["transpose_ms_v38912_bf16"],
    "arxiv16": ["spmm_composed.spmm_arxiv_fast16_ms_per_iter",
                "transpose_ms_v38912_bf16"],
    "parity16": ["fast16_blog_top20_agreement"],
    "walkloc": ["walk_locality_arxiv"],
    "segsum": ["segsum_blogshape"],
    "flagship": ["flagship_relabel"],
}


def done_parts():
    try:
        res = json.load(open(OUT))
    except Exception:
        return set()
    def has(key):
        node = res
        for part in key.split("."):
            if not isinstance(node, dict) or part not in node:
                return False
            node = node[part]
        return True

    return {p for p, keys in PART_KEYS.items() if all(has(k) for k in keys)}


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 3 * 3600
    want = set(sys.argv[2:]) or set(PART_KEYS)
    deadline = time.time() + budget
    members = ["8092", "8102", "8112", "8082", None]
    # a canary-timeout client DIES on the member and resets its 30-60
    # min recovery clock — touching a dead member too often keeps it
    # dead forever.  After a canary failure (rc=3 within ~200s), leave
    # that member alone for a full recovery window.
    cooldown_until = {m: 0.0 for m in members}
    COOLDOWN_S = 4500.0
    cycle = 0
    while time.time() < deadline:
        missing = want - done_parts()
        if not missing:
            print(f"[orch] all parts done: {sorted(want)}", flush=True)
            return 0
        cycle += 1
        print(f"[orch] cycle {cycle}: missing {sorted(missing)}",
              flush=True)
        for port in members:
            if not (want - done_parts()):
                return 0
            if time.time() < cooldown_until[port]:
                print(f"[orch] member {port}: cooling down "
                      f"({cooldown_until[port]-time.time():.0f}s left)",
                      flush=True)
                continue
            env = dict(os.environ)
            if port is not None:
                env["GRAPHTPU_AXON_MEMBER"] = port
                env["PALLAS_AXON_POOL_IPS"] = ""
            else:
                env.pop("GRAPHTPU_AXON_MEMBER", None)
            t0 = time.time()
            try:
                cp = subprocess.run(
                    [sys.executable, os.path.join(HERE, "r5_tpu_batch.py"),
                     *sorted(want - done_parts())],
                    timeout=min(3600, max(300, deadline - time.time())),
                    env=env,
                )
                rc = cp.returncode
            except subprocess.TimeoutExpired:
                rc = "timeout"
            dt = time.time() - t0
            if rc == 3 and dt < 260:
                # canary death: this touch itself reset the member's
                # recovery clock — back off a full window
                cooldown_until[port] = time.time() + COOLDOWN_S
            elif rc == 5:
                # poisoned member burned: its worker may restart clean
                # in ~1 min — retry soon
                cooldown_until[port] = time.time() + 300.0
            print(f"[orch] member {port}: rc={rc} ({dt:.0f}s)",
                  flush=True)
        if want - done_parts():
            # canary attempts ARE clients: probing too often resets
            # the 30-60 min member recovery clocks (CLAUDE.md).  Sleep
            # until the earliest cooldown expires (bounded).
            now = time.time()
            next_up = min(cooldown_until.values())
            wait = min(2400.0, max(180.0, next_up - now))
            print(f"[orch] cycle complete; sleeping {wait:.0f}s for pool "
                  "recovery", flush=True)
            time.sleep(wait)
    print(f"[orch] budget expired; missing {sorted(want - done_parts())}",
          flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
