"""Deliberate worker recycle for an HBM-poisoned pool member.

Round-4/5 observation: a crashed client leaks multi-GB HBM buffers that
survive into every later session **until the member's worker process
restarts** — and the only in-band way to force a restart is the
worker's own watchdog: "single device executions that run for minutes
get the worker killed" (CLAUDE.md).  This tool weaponises that: it
submits ONE intentionally long device execution (a fori_loop of large
matmuls, ~several minutes of MXU time), waits for the watchdog to kill
the worker (the client sees a connection error), then exits.  The
member restarts in ~1 minute with CLEAN HBM.

Usage:
  PALLAS_AXON_POOL_IPS= GRAPHTPU_AXON_MEMBER=8112 python tools/axon_reset.py [n_loop]

Exit codes: 0 = execution errored as expected (worker likely recycled),
3 = canary dead (member already wedged), 4 = the long execution
finished without being killed (increase n_loop).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import graphtpu  # noqa: F401 - registers the pinned pool member
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        print("[reset] cpu backend; nothing to do", flush=True)
        return 0
    from graphtpu.axon_pin import canary

    canary(timeout_s=180.0, exit_code=3)
    from graphtpu.axon_pin import submit_burn

    outer = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    print(f"[reset] submitting {outer}x50000 burn...", flush=True)
    return 0 if submit_burn(outer=outer) else 4


if __name__ == "__main__":
    sys.exit(main())
