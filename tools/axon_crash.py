"""Last-resort worker recycle: crash the worker by killing a client
MID-EXECUTION.

When a member is so saturated that neither probes (HBM full) nor the
watchdog burn (compile service dead) can run, the one remaining in-band
lever is the failure mode CLAUDE.md warns about: "Never kill TPU client
processes mid-execution ... the worker can crash and needs ~1 min to
recover".  A crashed worker RESTARTS — and a restarted worker frees
every leaked buffer.  This tool spawns a child that hammers the (cached,
tiny) canary matmul in a loop and SIGKILLs that exact PID mid-stream.

Usage:
  PALLAS_AXON_POOL_IPS= GRAPHTPU_AXON_MEMBER=8112 python tools/axon_crash.py
"""

import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = """
import sys, time
sys.path.insert(0, %r)
import graphtpu  # registers the pinned member
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
# warm the (cached) executable, then hammer without readbacks so the
# kill lands mid-execution with work in flight.  ONLY the canary's
# exact op shape is used: the member's compile service is dead, so
# every op must hit the executable cache (values saturating to inf in
# bf16 is harmless).
y = x @ x
float(y[0, 0])
print("child: warm, hammering", flush=True)
while True:
    for _ in range(1000):
        y = y @ y
    y.block_until_ready()
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = subprocess.Popen(
        [sys.executable, "-c", CHILD % repo],
        stdout=open("/tmp/axon_crash_child.log", "w"),
        stderr=subprocess.STDOUT, text=True,
    )
    # fixed grace: healthy first-op latency is ~55s; by 90s the child is
    # either hammering (kill lands mid-execution -> worker crash) or
    # stuck claiming (kill wedges -> member recycles the slow way).
    # Blocking on the child's stdout can hang forever on a dead member.
    time.sleep(90.0)
    if child.poll() is not None:
        print(f"[crash] child exited early rc={child.returncode}",
              flush=True)
        return 3
    child.send_signal(signal.SIGKILL)  # exact PID we spawned
    child.wait()
    print("[crash] child SIGKILLed mid-execution — worker should crash "
          "and restart (~1 min)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
