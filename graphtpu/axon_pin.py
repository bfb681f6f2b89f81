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
