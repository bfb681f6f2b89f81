"""Top-k extraction and bounded top-k accumulation.

Two layers, matching the two ways the reference keeps similarity rows:

* dense rows + final heap extraction — ``Print.printByOrder`` builds a
  FixedMaxPQ per row (``utils/Print.java:25-53``).  Our
  :func:`topk_rows` is ``lax.top_k`` over a [B, V] tile, plus an optional
  streamed merge across tiles (:func:`merge_topk`) so no dense V x V state
  ever exists — the TPU form of the reference's batched-source windows
  (``giraph/BatchSingleWalkVertex.java:108-133``).

* bounded in-flight accumulators — ``lxctools/FixedCacheMap`` accumulates
  into capacity-bounded min-heaps during the walk (``FixedCacheMap.java:
  32-50``: accumulate if present, insert if not full, else replace the min
  iff the new value beats it).  :func:`bounded_topk_accumulate` reproduces
  those exact semantics vectorised over sources (a scan over items with
  masked scatter), for scale regimes where dense rows don't fit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def topk_rows(
    scores: jax.Array,
    k: int,
    exclude_diag_offset: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(values, indices) of the k largest entries per row of [B, V].

    ``exclude_diag_offset=r`` masks column ``r + i`` in row i (the
    "sim(v,v)=0" post-processing of ``SimRank.java:62-65`` when row i is
    global source r+i).
    """
    if exclude_diag_offset is not None:
        b, v = scores.shape
        rows = jnp.arange(b)
        scores = scores.at[rows, exclude_diag_offset + rows].set(-jnp.inf)
    k_eff = min(k, scores.shape[-1])
    vals, idx = jax.lax.top_k(scores, k_eff)
    idx = idx.astype(jnp.int32)
    if k_eff < k:  # pad to the requested width (idx -1, val 0)
        pad = ((0, 0),) * (vals.ndim - 1) + ((0, k - k_eff),)
        vals = jnp.pad(vals, pad)
        idx = jnp.pad(idx, pad, constant_values=-1)
    return vals, idx


def merge_topk(
    vals_a: jax.Array, idx_a: jax.Array, vals_b: jax.Array, idx_b: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Merge two per-row top-k sets into one (streamed tile reduction)."""
    vals = jnp.concatenate([vals_a, vals_b], axis=1)
    idx = jnp.concatenate([idx_a, idx_b], axis=1)
    mv, mi = jax.lax.top_k(vals, k)
    return mv, jnp.take_along_axis(idx, mi, axis=1)


def bounded_topk_accumulate(
    keys: jax.Array,
    values: jax.Array,
    capacity: int,
    init_keys: Optional[jax.Array] = None,
    init_values: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """FixedCacheMap.put semantics over an item stream, per source.

    ``keys``/``values``: [B, N] item streams (key < 0 = skip).  Returns
    (slot_keys [B, C], slot_values [B, C]) with -1 in empty key slots.
    Exact reference semantics (``FixedCacheMap.java:32-50``): items are
    processed in order; an existing key accumulates; a new key fills an
    empty slot; once full, a new key evicts the current minimum only if its
    value is strictly greater.
    """
    b, n = keys.shape
    if init_keys is None:
        slot_k = jnp.full((b, capacity), -1, jnp.int32)
        slot_v = jnp.zeros((b, capacity), values.dtype)
    else:
        slot_k, slot_v = init_keys, init_values

    def step(carry, item):
        sk, sv = carry
        k_i, v_i = item  # [B], [B]
        valid = k_i >= 0
        match = sk == k_i[:, None]  # [B, C]
        present = match.any(axis=1)
        # 1) accumulate where present
        sv = sv + jnp.where(match & valid[:, None], v_i[:, None], 0)
        # 2) insert into first empty slot when absent and not full
        empty = sk < 0
        has_empty = empty.any(axis=1)
        first_empty = jnp.argmax(empty, axis=1)
        do_insert = valid & ~present & has_empty
        rows = jnp.arange(b)
        sk = sk.at[rows, first_empty].set(
            jnp.where(do_insert, k_i, sk[rows, first_empty])
        )
        sv = sv.at[rows, first_empty].set(
            jnp.where(do_insert, v_i, sv[rows, first_empty])
        )
        # 3) evict min when absent and full and v > min
        occupied_v = jnp.where(sk >= 0, sv, jnp.inf)
        minpos = jnp.argmin(occupied_v, axis=1)
        minval = occupied_v[rows, minpos]
        do_evict = valid & ~present & ~has_empty & (v_i > minval)
        sk = sk.at[rows, minpos].set(jnp.where(do_evict, k_i, sk[rows, minpos]))
        sv = sv.at[rows, minpos].set(jnp.where(do_evict, v_i, sv[rows, minpos]))
        return (sk, sv), None

    (slot_k, slot_v), _ = jax.lax.scan(
        step, (slot_k, slot_v), (keys.T, values.T)
    )
    return slot_k, slot_v


def bounded_slots_to_topk(
    slot_k: jax.Array, slot_v: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Extract descending top-k (values, keys) from accumulator slots."""
    masked = jnp.where(slot_k >= 0, slot_v, -jnp.inf)
    vals, pos = jax.lax.top_k(masked, k)
    keys = jnp.take_along_axis(slot_k, pos, axis=1)
    keys = jnp.where(jnp.isfinite(vals), keys, -1)
    vals = jnp.where(jnp.isfinite(vals), vals, 0.0)
    return vals, keys
