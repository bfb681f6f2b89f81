"""PRNG stream helpers.

The reference relies on shared ``java.util.Random``/``np.random`` state
(noted hazard: ``structures/Graph.java:17`` shares one Random across
threads).  We use counter-based threefry keys exclusively: every kernel
takes an explicit key, splits are deterministic, and multi-device runs fold
in the device index — determinism is a test, not an accident.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def key_for(seed: int, *stream: int) -> jax.Array:
    """A named PRNG stream: fold each stream id into the seed key."""
    k = jax.random.key(seed)
    for s in stream:
        k = jax.random.fold_in(k, s)
    return k


def per_device_key(key: jax.Array, axis_name: str) -> jax.Array:
    """Inside shard_map/pjit: decorrelate per-device streams."""
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))
