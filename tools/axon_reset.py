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
    # SMALL footprint (one 2048^2 bf16 operand = 8 MB — must fit even a
    # fully leak-poisoned member) but LONG device time: 2048^3 bf16
    # ~ 0.1 ms/iter on a v5e MXU; 5M iterations ~ minutes in ONE
    # execution — past the worker watchdog, which kills + restarts the
    # worker and frees every buffer this member has leaked.
    n_loop = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    x = jnp.ones((2048, 2048), jnp.bfloat16)

    @jax.jit
    def burn(x, n):
        def body(_, y):
            return jnp.tanh(y @ y) * 0.999

        return jax.lax.fori_loop(0, n, body, x)

    print(f"[reset] submitting {n_loop}-loop burn...", flush=True)
    t0 = time.time()
    try:
        y = burn(x, jnp.int32(n_loop))
        # the readback is what actually blocks on the execution
        float(y[0, 0])
        print(f"[reset] burn FINISHED in {time.time()-t0:.0f}s — "
              "watchdog did not fire; increase n_loop", flush=True)
        return 4
    except Exception as e:
        print(f"[reset] execution died after {time.time()-t0:.0f}s: "
              f"{type(e).__name__} — worker likely recycling", flush=True)
        return 0


if __name__ == "__main__":
    sys.exit(main())
