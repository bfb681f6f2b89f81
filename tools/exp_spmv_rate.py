"""Microbenchmark the streaming SpMV kernel's ITEM RATE on hardware.

Round-4 finding: the arxiv iterate runs at ~2.4 us/item (r2 recorded
~0.74 us/item for the same ring design) and Kahan==fast, so the kernel
is bound by per-item overheads, not VPU passes or HBM bytes.  This tool
isolates the candidates:

  * full kernel (fast + kahan) x nbuf {16, 64} x block_items {1024, 8192}
  * DMA-only variant (no accumulate): pure DMA-issue + wait rate
  * VPU-only variant (no DMA: accumulate a resident buffer): scalar
    control + VPU rate

Usage: PALLAS_AXON_POOL_IPS= GRAPHTPU_AXON_MEMBER=8xx2 python tools/exp_spmv_rate.py
"""

import functools as _ft
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

INTERP = bool(os.environ.get("GT_INTERP"))


def _dma_only_kernel(c, nbuf, slots_ref, wts_ref, pos_ref, table_ref,
                     out_ref, buf, acc, rd_sems, wr_sems, state):
    """Ring of row DMAs, no accumulate: measures DMA issue/wait rate."""
    import jax.lax as lax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tb = slots_ref.shape[0]
    step = pl.program_id(0)

    def rd_dma(t):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(slots_ref[t] * c, c)],
            buf.at[pl.ds((t % nbuf) * c, c)],
            rd_sems.at[t % nbuf],
        )

    for t in range(nbuf):
        rd_dma(t).start()

    def body(t, _):
        rd_dma(t).wait()

        @pl.when(t + nbuf < tb)
        def _():
            rd_dma(t + nbuf).start()

        return 0

    lax.fori_loop(0, tb, body, 0)
    # one write per grid step so the kernel has an observable effect
    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        acc[pl.ds(0, c)] = buf[pl.ds(0, c)]
        cp = pltpu.make_async_copy(
            acc.at[pl.ds(0, c)], out_ref.at[pl.ds(0, c)], wr_sems.at[0]
        )
        cp.start()
        cp.wait()


def _vpu_only_kernel(c, nbuf, slots_ref, wts_ref, pos_ref, table_ref,
                     out_ref, buf, acc, rd_sems, wr_sems, state):
    """No DMAs: per-item branch + accumulate from the resident ring
    buffer — measures scalar-control + VPU rate."""
    import jax.lax as lax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tb = slots_ref.shape[0]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        state[0] = -1
        state[1] = 0

    def body(t, _):
        row_pos = pos_ref[t]
        prev = state[0]
        is_new = row_pos != prev

        @pl.when(is_new)
        def _():
            state[0] = row_pos
            state[1] = 1 - state[1]

        z = state[1]
        row = buf[pl.ds((t % nbuf) * c, c)] * wts_ref[t]

        @pl.when(is_new)
        def _():
            acc[pl.ds(z * c, c)] = row

        @pl.when(jnp.logical_not(is_new))
        def _():
            acc[pl.ds(z * c, c)] = acc[pl.ds(z * c, c)] + row

        return 0

    lax.fori_loop(0, tb, body, 0)

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        cp = pltpu.make_async_copy(
            acc.at[pl.ds(0, c)], out_ref.at[pl.ds(0, c)], wr_sems.at[0]
        )
        cp.start()
        cp.wait()


def _fast_unroll_kernel(c, nbuf, slots_ref, wts_ref, pos_ref,
                        table_ref, out_ref, buf, acc, rd_sems, wr_sems,
                        state):
    """The fast kernel with the item loop unrolled G-wide: the scalar
    core runs one fori_loop step per G items (straightline per-item
    bodies), amortising loop-carry + scheduling overhead.  Unweighted
    form (raw accumulate; row scale skipped — rate measurement only,
    not a drop-in)."""
    import jax.lax as lax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tb = slots_ref.shape[0]
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        state[0] = -1
        state[1] = 0
        state[2] = 0
        state[3] = 0

    def rd_dma(t):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(slots_ref[t] * c, c)],
            buf.at[pl.ds((t % nbuf) * c, c)],
            rd_sems.at[t % nbuf],
        )

    for t in range(nbuf):
        rd_dma(t).start()

    def wr_dma(zone, row):
        return pltpu.make_async_copy(
            acc.at[pl.ds(zone * c, c)],
            out_ref.at[pl.ds(row * c, c)],
            wr_sems.at[zone],
        )

    def one_item(t):
        row_pos = pos_ref[t]
        prev = state[0]
        zone = state[1]
        is_new = row_pos != prev

        @pl.when(is_new)
        def _():
            @pl.when(prev >= 0)
            def _():
                wr_dma(zone, prev).start()
                state[2 + zone] = 1

            nz = 1 - zone

            @pl.when(state[2 + nz] == 1)
            def _():
                wr_dma(nz, 0).wait()
                state[2 + nz] = 0

            state[0] = row_pos
            state[1] = nz

        z = state[1]
        rd_dma(t).wait()
        row = buf[pl.ds((t % nbuf) * c, c)]

        @pl.when(is_new)
        def _():
            acc[pl.ds(z * c, c)] = row

        @pl.when(jnp.logical_not(is_new))
        def _():
            acc[pl.ds(z * c, c)] = acc[pl.ds(z * c, c)] + row

        @pl.when(t + nbuf < tb)
        def _():
            rd_dma(t + nbuf).start()

    def body(i, _):
        for g in range(8):
            one_item(i * 8 + g)
        return 0

    lax.fori_loop(0, tb // 8, body, 0)

    @pl.when(step == nsteps - 1)
    def _():
        zone = state[1]
        wr_dma(zone, state[0]).start()
        wr_dma(zone, 0).wait()
        nz = 1 - zone

        @pl.when(state[2 + nz] == 1)
        def _():
            wr_dma(nz, 0).wait()
            state[2 + nz] = 0


def variant_call(kernel_fn, stream, x, c, nbuf):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    v = stream.n_nodes
    tb = stream.block_items
    t_total = stream.slots.shape[0]
    smem = lambda: pl.BlockSpec((tb,), lambda i: (i,),
                                memory_space=pltpu.SMEM)
    kernel = pl.pallas_call(
        _ft.partial(kernel_fn, c, nbuf),
        out_shape=jax.ShapeDtypeStruct(((v + 1) * c,), x.dtype),
        grid=(t_total // tb,),
        in_specs=[smem(), smem(), smem(),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((nbuf * c,), x.dtype),
            pltpu.VMEM((2 * c,), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((4,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
        interpret=INTERP,
    )
    return kernel(stream.slots, stream.wts, stream.pos, x)


def main():
    import graphtpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from graphtpu.kernels.spmm import build_spmv_stream, spmv_pallas_flat

    if jax.default_backend() != "cpu":
        from graphtpu.axon_pin import canary

        canary(timeout_s=180.0)

    out = {}
    for name, path, n_nodes in (
        ("arxiv",
         "/root/reference/DeepSim/lshrank_data/realdata/arxiv_author_pub.txt",
         38912),
        ("blog",
         "/root/reference/DeepSim/lshrank_data/realdata/blog.txt",
         10496),
    ):
        g = graphtpu.read_edgelist_graph(path, n_nodes=n_nodes)
        v = -(-g.n_nodes // 1024) * 1024
        from graphtpu.core.graph import pad_graph_nodes

        gp = pad_graph_nodes(g, v)
        x = jnp.ones((v * v,), jnp.float32)

        def timed(fn, *a, reps=3, **kw):
            r = fn(*a, **kw)
            jax.block_until_ready(r)
            del r  # a held result + the next call's output + x would
            best = 1e9  # exceed HBM (2 x 6 GB iterates at arxiv)
            for _ in range(reps):
                t0 = time.time()
                r = fn(*a, **kw)
                jax.block_until_ready(r)
                best = min(best, time.time() - t0)
                del r
            return best

        for block in (1024, 8192):
            stream = build_spmv_stream(gp, block_items=block)
            n_items = stream.slots.shape[0]
            for mode in ("fast", "kahan"):
                for nbuf in (16, 64):
                    key = f"{name}_b{block}_{mode}_n{nbuf}"
                    try:
                        dt = timed(
                            jax.jit(lambda xx: spmv_pallas_flat(
                                stream, xx, v, nbuf=nbuf, mode=mode,
                                interpret=INTERP)), x
                        )
                        out[key] = round(dt / n_items * 1e9)  # ns/item
                        print(f"{key}: {dt*1e3:.0f} ms = "
                              f"{out[key]} ns/item", flush=True)
                    except Exception as e:
                        print(f"{key}: FAILED {e!r}", flush=True)
            # stripped variants at nbuf=16 on this stream
            for vname, kfn in (("dmaonly", _dma_only_kernel),
                               ("vpuonly", _vpu_only_kernel),
                               ("unroll8", _fast_unroll_kernel)):
                key = f"{name}_b{block}_{vname}"
                try:
                    dt = timed(
                        jax.jit(lambda xx: variant_call(
                            kfn, stream, xx, v, 16)), x
                    )
                    out[key] = round(dt / n_items * 1e9)
                    print(f"{key}: {dt*1e3:.0f} ms = {out[key]} ns/item",
                          flush=True)
                except Exception as e:
                    print(f"{key}: FAILED {e!r}", flush=True)
            # transpose strategies at this shape (suspect: the XLA flat
            # transpose lowers to gathers; decisive for the 1.6 s/iter
            # blog anomaly).  Runs on the LAST block pass, with the
            # kernel operand freed first — x + in + out + temps would
            # exceed HBM at arxiv (observed RESOURCE_EXHAUSTED).
            if block == 8192:
                del x
                # deleted buffers free asynchronously on the remote
                # runtime and exception tracebacks pin frames: collect
                # + drain before allocating two fresh iterates
                import gc

                gc.collect()
                jax.block_until_ready(jnp.zeros((8,)) + 1)
                time.sleep(2)
                import jax.numpy as jnp
                from functools import partial as fpart

                dtype = jnp.float32
                tp_b = min(v, 4096)
                n_full, tp_rem = divmod(v, tp_b)

                @fpart(jax.jit, donate_argnums=(0,))
                def tp_onejit(ps):
                    x2 = ps[: v * v].reshape(v, v)
                    parts = []
                    for i in range(n_full + (1 if tp_rem else 0)):
                        b2 = tp_b if i < n_full else tp_rem
                        lo = i * tp_b
                        parts.append(x2[:, lo : lo + b2].T.reshape(-1))
                    parts.append(jnp.zeros((v,), dtype))
                    return jnp.concatenate(parts)

                @fpart(jax.jit, donate_argnums=(0,))
                def tp_plain2d(ps):
                    # 2-D XLA transpose (layout-level) + relayouts
                    return jnp.pad(
                        ps[: v * v].reshape(v, v).T.reshape(-1), (0, v)
                    )

                # (tp_pallas adjudicated OUT round 5 and deleted:
                # blog-f32 tie, Mosaic-rejected at bf16)
                for tname, tfn in (("tp_onejit", tp_onejit),
                                   ("tp_plain2d", tp_plain2d)):
                    key = f"{name}_{tname}"
                    try:
                        xx = jnp.ones(((v + 1) * v,), jnp.float32)
                        r = tfn(xx)
                        jax.block_until_ready(r)
                        best = 1e9
                        for _ in range(3):
                            xx2 = r  # donate the previous output
                            t0 = time.time()
                            r = tfn(xx2)
                            jax.block_until_ready(r)
                            best = min(best, time.time() - t0)
                        out[key] = round(best * 1e3)
                        print(f"{key}: {best*1e3:.0f} ms", flush=True)
                        del r
                    except Exception as e:
                        print(f"{key}: FAILED {e!r}", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
