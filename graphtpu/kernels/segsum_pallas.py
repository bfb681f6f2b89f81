"""Pallas TPU kernel: fused one-hot segment row-sum on the MXU.

The embedding-gradient aggregation (sum [N, D] rows by segment id into
[S, D]) is the hottest non-matmul op in SGNS training.  XLA's choices are
a serialised scatter-add or our sort+cumsum pipeline
(``kernels.topk.segment_rows_sum``); the matmul formulation
(``segment_rows_sum_matmul``) is MXU-friendly but materialises [C, S]
one-hot tiles in HBM.  This kernel fuses the one-hot construction into
VMEM so the only HBM traffic is the items in and the [S, D] accumulator
out:

  grid = (segment_tiles, item_chunks);  per program:
    onehot[C, TS] = (idx_chunk == tile ids)      (built in VMEM, bf16)
    out_tile    += onehot^T @ rows_chunk          (MXU, f32 accumulate)

Item chunks iterate innermost so each output tile accumulates in place
across the chunk dimension (standard Pallas reduction pattern).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _seg_kernel(idx_ref, rows_ref, out_ref, *, tile_s: int):
    i = pl.program_id(1)  # item-chunk (innermost grid dim)
    s = pl.program_id(0)  # segment tile

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = idx_ref[:]                                  # [C, 1] int32
    c = ids.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (c, tile_s), 1) + s * tile_s
    onehot = (ids == col).astype(jnp.bfloat16)        # [C, TS]
    out_ref[:] += jax.lax.dot_general(
        onehot,
        rows_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def segment_rows_sum_pallas(
    idx: jax.Array,
    rows: jax.Array,
    n_segments: int,
    chunk: int = 2048,
    tile_s: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(sums [n_segments, D], counts [n_segments]); idx < 0 rows skipped."""
    n, d = rows.shape
    # pad items to a chunk multiple; segment axis to a tile multiple
    pad_n = (-n) % chunk
    if pad_n:
        idx = jnp.concatenate([idx, jnp.full((pad_n,), -1, idx.dtype)])
        rows = jnp.concatenate([rows, jnp.zeros((pad_n, d), rows.dtype)])
        n += pad_n
    s_pad = -(-n_segments // tile_s) * tile_s
    # counts ride along as an extra ones column
    rows_aug = jnp.concatenate(
        [rows.astype(jnp.float32), jnp.ones((n, 1), jnp.float32)], axis=1
    )
    da = d + 1
    grid = (s_pad // tile_s, n // chunk)
    out = pl.pallas_call(
        functools.partial(_seg_kernel, tile_s=tile_s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda s, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, da), lambda s, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_s, da), lambda s, i: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, da), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32)[:, None], rows_aug)
    return out[:n_segments, :d].astype(rows.dtype), out[:n_segments, d]
