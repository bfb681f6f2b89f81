"""Tiled flat->flat transpose as a Pallas kernel.

The streaming SimRank loop keeps multi-GB iterates FLAT (1-D row-major)
between stages — the layout the streaming SpMV consumes without an XLA
relayout copy.  The per-iteration transpose (P·S -> (P·S)ᵀ) therefore
needs flat input AND flat output; XLA's lowering of the flat reshape +
transpose chain was measured at >1 s for a 0.5 GB iterate on v5e (it
gathers), while the underlying movement is two clean memory passes.

This kernel does exactly those two passes: grid over [TB, TB] tiles;
each tile reads TB contiguous row segments (TB·4 B DMAs) into VMEM,
transposes on the VPU, and writes TB contiguous row segments of the
output.  TB is the largest of {2048, 1024} dividing V (the framework
pads V to a 1024 multiple), so segments are 4-8 KB and VMEM holds
2·TB²·4 B ≤ 32 MB.

Reference context: ``simrank/SimRank.java:67-77`` — the S·Pᵀ half of
the update.
"""

from __future__ import annotations

import functools as _ft

import jax
import jax.numpy as jnp


def _transpose_kernel(v, tb, nbuf, in_ref, out_ref, buf, vt, sems, wsems):
    """One [tb, tb] tile: tile row = I, tile col = J (grid order)."""
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)

    def rd(r):
        # input row I*tb + r, columns [J*tb, J*tb + tb)
        return pltpu.make_async_copy(
            in_ref.at[pl.ds((i * tb + r) * v + j * tb, tb)],
            buf.at[pl.ds(r * tb, tb)],
            sems.at[r % nbuf],
        )

    for r in range(nbuf):
        rd(r).start()

    def rbody(r, _):
        rd(r).wait()

        @pl.when(r + nbuf < tb)
        def _():
            rd(r + nbuf).start()

        return 0

    lax.fori_loop(0, tb, rbody, 0)

    # VPU transpose of the staged tile
    vt[...] = buf[...].reshape(tb, tb).T.reshape(-1)

    def wr(c2):
        # output row J*tb + c2, columns [I*tb, I*tb + tb)
        return pltpu.make_async_copy(
            vt.at[pl.ds(c2 * tb, tb)],
            out_ref.at[pl.ds((j * tb + c2) * v + i * tb, tb)],
            wsems.at[c2 % nbuf],
        )

    for c2 in range(nbuf):
        wr(c2).start()

    def wbody(c2, _):
        wr(c2).wait()

        @pl.when(c2 + nbuf < tb)
        def _():
            wr(c2 + nbuf).start()

        return 0

    lax.fori_loop(0, tb, wbody, 0)


def transpose_flat_pallas(
    x_flat: jax.Array,
    v: int,
    tb: int | None = None,
    nbuf: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Transpose the leading [v, v] of a flat row-major array; returns a
    ((v+1)*v,) flat result (the streaming-mul input shape; the final v
    entries are unspecified padding)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if tb is None:
        for cand in (2048, 1024):
            if v % cand == 0:
                tb = cand
                break
        else:
            raise ValueError(f"V={v} not a multiple of 1024")
    assert v % tb == 0
    nb = v // tb
    kernel = pl.pallas_call(
        _ft.partial(_transpose_kernel, v, tb, nbuf),
        out_shape=jax.ShapeDtypeStruct(((v + 1) * v,), x_flat.dtype),
        grid=(nb, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((tb * tb,), x_flat.dtype),
            pltpu.VMEM((tb * tb,), x_flat.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary", "arbitrary"),
            # 2 x tb^2 x 4 B scratch, double-buffered by Mosaic across
            # grid steps: the default 16 MB scoped-vmem cap rejects even
            # tb=1024 (observed on hardware); the chip has 128 MB
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    return kernel(x_flat)
