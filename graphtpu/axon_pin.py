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
import subprocess
import sys

POOL_MEMBERS = ("8082", "8092", "8102", "8112")

_PROBE_SRC = """
import graphtpu, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
assert float((x @ x)[0, 0]) == 256.0
print("HEALTHY")
"""


def autoselect_member(
    timeout: float = 90.0, verbose: bool = True, pin: bool = True
) -> str | None:
    """Probe every pool member in parallel subprocesses; pin the first
    healthy one in THIS process (must run before JAX backend init).

    A wedged worker accepts claims but hangs every execution, so the
    only reliable health check is a real matmul + readback — done in
    subprocesses so a hang cannot wedge the caller.  Returns the chosen
    port, or None (leave the default pool picker) if none respond.
    No-op when the axon platform is absent or a member is already
    pinned.

    ``pin=True`` registers the member in this process — valid only when
    the sitecustomize pool auto-register was skipped (process launched
    with ``PALLAS_AXON_POOL_IPS=``); the axon backend refuses re-entry
    with different options.  A process that was auto-registered must
    instead re-exec itself with ``GRAPHTPU_AXON_MEMBER=<port>
    PALLAS_AXON_POOL_IPS=`` (``pin=False``; see bench.py)."""
    if os.environ.get("_GRAPHTPU_AXON_PINNED"):
        return os.environ.get("GRAPHTPU_AXON_MEMBER")
    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return None
    procs = {}
    for port in POOL_MEMBERS:
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["GRAPHTPU_AXON_MEMBER"] = port
        env.pop("_GRAPHTPU_AXON_PINNED", None)
        procs[port] = subprocess.Popen(
            [sys.executable, "-c", _PROBE_SRC],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    import time

    deadline = time.time() + timeout
    chosen = None
    try:
        while time.time() < deadline and chosen is None:
            for port, p in procs.items():
                rc = p.poll()
                if rc == 0 and b"HEALTHY" in (p.stdout.read() or b""):
                    chosen = port
                    break
            time.sleep(1.0)
    finally:
        for p in procs.values():
            if p.poll() is None:
                p.kill()
    if chosen is not None:
        if verbose:
            print(f"[graphtpu.axon_pin] healthy pool member: {chosen}",
                  file=sys.stderr)
        if pin:
            os.environ["GRAPHTPU_AXON_MEMBER"] = chosen
            os.environ["PALLAS_AXON_POOL_IPS"] = ""
            pin_pool_member()
    elif verbose:
        print("[graphtpu.axon_pin] no healthy pool member found; "
              "using default picker", file=sys.stderr)
    return chosen


def canary(timeout_s: float = 120.0, exit_code: int = 3) -> None:
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
