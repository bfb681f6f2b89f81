"""Opt-in axon pool-member pinning (see CLAUDE.md "TPU worker recovery").

The axon tunnel exposes four pool members (leader ports 8082/8092/8102/
8112).  A worker wedged by a client killed mid-execution keeps accepting
claims, so the default pool picker can land every new process on the dead
member and every execution then hangs at the first readback.  Launching
with

    PALLAS_AXON_POOL_IPS= GRAPHTPU_AXON_MEMBER=8092 python tools/...

disables the sitecustomize auto-register (empty POOL_IPS) and registers
the named member explicitly from ``graphtpu.__init__`` instead.  No-op
unless GRAPHTPU_AXON_MEMBER is set; must run before JAX's first backend
use (importing graphtpu before any device op suffices).
"""

import os
import sys

POOL_MEMBERS = ("8082", "8092", "8102", "8112")

# NOTE: there is deliberately NO "probe every member in a subprocess,
# then launch the real job" helper here (round 3 shipped one;
# ADVICE r3 showed it violates the recovery protocol twice over: a
# probe killed at <120s dies mid-claim and WEDGES the member it was
# testing, and a probe that succeeds consumes a recovered member's
# one-process-per-recovery-cycle slot so the real job pinned afterwards
# hangs).  Health is checked by the real job itself via ``canary()``
# below, with an external loop cycling GRAPHTPU_AXON_MEMBER on exit 3
# (see bench.py ``orchestrate``).


def canary(timeout_s: float = 180.0, exit_code: int = 3) -> None:
    """Fail fast if this process's pool member hangs executions.

    A recovered member serves ONE process per recovery cycle, so health
    must be checked by the real job itself, not a throwaway probe
    process.  The watchdog is a thread: a hung device readback never
    returns to Python, so only os._exit can unstick the process —
    callers (or wrapping scripts) treat ``exit_code`` as "try the next
    member"."""
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(
                f"[graphtpu.axon_pin] canary: no readback within "
                f"{timeout_s:.0f}s; exit {exit_code}",
                file=sys.stderr,
                flush=True,
            )
            os._exit(exit_code)

    threading.Thread(target=watchdog, daemon=True).start()
    import jax.numpy as jnp

    x = jnp.ones((256, 256), jnp.bfloat16)
    assert float((x @ x)[0, 0]) == 256.0
    done.set()
    print("[graphtpu.axon_pin] canary: member healthy", file=sys.stderr)


def submit_burn(outer: int = 50_000, inner: int = 50_000, x=None) -> bool:
    """Force this member's worker to recycle via its own execution
    watchdog: submit ONE minutes-long device execution with a
    canary-sized operand (256² bf16 = 128 KB — must fit even a
    100%-leaked pool).  The watchdog kill restarts the worker, freeing
    every buffer this member leaked (round-5 pool model, CLAUDE.md).

    Returns True if the execution errored (worker likely recycling),
    False if it finished un-killed (raise the loop counts).

    ``x``: pass a PRE-ALLOCATED (256, 256) bf16 operand reserved right
    after the canary — after a failed multi-GB probe even 128 KB
    allocations die on a saturated member, so the burn operand must be
    reserved before any probe runs (round-5 observation)."""
    import time

    import jax
    import jax.numpy as jnp

    try:
        if x is None:
            x = jnp.ones((256, 256), jnp.bfloat16)
    except Exception as e:
        print(
            f"[graphtpu.axon_pin] burn operand allocation failed "
            f"({type(e).__name__}); cannot burn", file=sys.stderr,
            flush=True,
        )
        return False

    @jax.jit
    def burn(x, n_out, n_in):
        def outer_body(_, y):
            return jax.lax.fori_loop(
                0, n_in, lambda _, z: jnp.tanh(z @ z) * 0.999, y
            )

        return jax.lax.fori_loop(0, n_out, outer_body, x)

    t0 = time.time()
    try:
        float(burn(x, jnp.int32(outer), jnp.int32(inner))[0, 0])
        print(
            f"[graphtpu.axon_pin] burn finished un-killed "
            f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True,
        )
        return False
    except Exception as e:
        print(
            f"[graphtpu.axon_pin] burn died after {time.time()-t0:.0f}s "
            f"({type(e).__name__}: {str(e)[:200]}) — worker likely "
            "recycling", file=sys.stderr, flush=True,
        )
        return True


def pin_pool_member() -> None:
    member = os.environ.get("GRAPHTPU_AXON_MEMBER")
    if not member or os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    if os.environ.get("_GRAPHTPU_AXON_PINNED"):
        return
    if "/root/.axon_site" not in sys.path:
        sys.path.insert(0, "/root/.axon_site")
    os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    try:
        import uuid

        from axon.register import register

        register(
            f"127.0.0.1:{member}",
            f"{os.environ.get('PALLAS_AXON_TPU_GEN', 'v5e')}:1x1x1",
            so_path="/opt/axon/libaxon_pjrt.so",
            session_id=str(uuid.uuid4()),
            remote_compile=True,
        )
        os.environ["_GRAPHTPU_AXON_PINNED"] = "1"
    except Exception as e:  # pragma: no cover - environment failure
        print(f"[graphtpu.axon_pin] register failed: {e!r}", file=sys.stderr)
