"""Round-4 probe: in-kernel per-row DMA gather vs XLA's ~3.5 ns/row.

The one untried gather-fusion route (VERDICT r3 Missing #1): drive
`pltpu.make_async_copy` row fetches from an HBM-resident band table with
edge indices read from SMEM, Q DMAs in flight, and measure the achieved
ns/row.  If the Mosaic DMA issue floor per 256-512 B row beats XLA's
measured 3.5 ns/row (scratch/probe_hbm2.py), fuse it into
ops/pallas/spmm_banded.py; if it loses, the banded SpMM is at its
architectural roofline with EVERY route measured.

Mosaic constraint found by scratch/probe_dma_bisect.py (2026-08-20): a
BLOCKED SMEM in_spec hard-crashes the remote compiler (HTTP 500), but
scalar-prefetched indices (PrefetchScalarGridSpec) compile and run — so
the probe prefetches the whole index array and is capped at M = 128K rows
(SMEM ~1 MB); production fusion at 2M edges would DMA idx chunks
HBM->SMEM, which the "idxdma" variant here measures.

Variants: G rows per DMA descriptor (G=1 true random gather; G=8
amortizes descriptor issue but only models a layout where 8 consecutive
edges have contiguous sources), Q outstanding DMAs, f32/bf16 rows.

Usage: timeout 900 env PYTHONPATH=/root/repo:/root/.axon_site \
    python scratch/probe_dma_gather.py
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mini_tpu.utils.timing import time_fn


def _gather_kernel(idx_ref, table_ref, out_ref, sems, *, chunk, q, g):
    """Grid step i gathers rows [i*chunk, (i+1)*chunk) of the output."""
    i = pl.program_id(0)
    nd = chunk // g  # DMAs this step

    def dma(j):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[i * chunk + j * g], g), :],
            out_ref.at[pl.ds(j * g, g), :],
            sems.at[jax.lax.rem(j, q)],
        )

    for d in range(min(q, nd)):
        dma(d).start()

    def body(j, _):
        @pl.when(j + q < nd)
        def _():
            dma(j + q).start()

        dma(j).wait()
        return 0

    jax.lax.fori_loop(0, nd, body, 0, unroll=False)


@functools.partial(
    jax.jit, static_argnames=("chunk", "q", "g", "interpret")
)
def dma_gather(idx, table, *, chunk, q, g, interpret=False):
    m = idx.shape[0]
    f = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((chunk, f), lambda i, ix: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((q,))],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, chunk=chunk, q=q, g=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, f), table.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * m * f * table.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, table)


def _idxdma_kernel(idx_hbm, table_ref, out_ref, idx_smem, isem, sems,
                   *, chunk, q):
    """Production-shaped variant: idx lives in HBM; each grid step DMAs
    its `chunk` indices into SMEM scratch first, then row-gathers."""
    i = pl.program_id(0)
    ic = pltpu.make_async_copy(
        idx_hbm.at[pl.ds(i * chunk, chunk)], idx_smem, isem
    )
    ic.start()
    ic.wait()

    def dma(j):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_smem[j], 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[jax.lax.rem(j, q)],
        )

    for d in range(min(q, chunk)):
        dma(d).start()

    def body(j, _):
        @pl.when(j + q < chunk)
        def _():
            dma(j + q).start()

        dma(j).wait()
        return 0

    jax.lax.fori_loop(0, chunk, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("chunk", "q", "interpret"))
def dma_gather_idxdma(idx, table, *, chunk, q, interpret=False):
    m = idx.shape[0]
    f = table.shape[1]
    return pl.pallas_call(
        functools.partial(_idxdma_kernel, chunk=chunk, q=q),
        grid=(m // chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((chunk, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((q,)),
        ],
        out_shape=jax.ShapeDtypeStruct((m, f), table.dtype),
        interpret=interpret,
    )(idx, table)


def run_case(name, fn, m, iters):
    t = time_fn(fn, warmup=1, repeat=3)
    ns_per_row = t.min_s / (iters * m) * 1e9
    print(f"{name:52s} {t.min_s*1e3:9.2f} ms  {ns_per_row:7.2f} ns/row",
          flush=True)
    return ns_per_row


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    M = 128 * 1024  # capped by the scalar-prefetch SMEM budget
    TABLE_ROWS = 65536
    ITERS = 32
    rng = np.random.RandomState(0)
    idx_base = jnp.asarray(rng.randint(0, TABLE_ROWS, M), jnp.int32)

    for dt, F in ((jnp.bfloat16, 128), (jnp.float32, 128)):
        table = jnp.ones((TABLE_ROWS, F), dt)
        dtname = np.dtype(dt).name

        # XLA reference on the identical config (whole output data-live)
        def xla_body(i, acc):
            out = jnp.take(table, (idx_base + i) & (TABLE_ROWS - 1),
                           axis=0, fill_value=0)
            return acc + jnp.sum(out.astype(jnp.float32), axis=0)

        xla_fn = jax.jit(lambda: jax.lax.fori_loop(
            0, ITERS, xla_body, jnp.zeros((F,), jnp.float32)))
        np.asarray(xla_fn()[0])
        run_case(f"xla take M=128K [{TABLE_ROWS},{F}] {dtname}",
                 xla_fn, M, ITERS)

        for g, q in ((1, 8), (1, 16), (1, 32), (8, 8), (8, 16)):
            def loop_body(i, acc, g=g, q=q):
                ix = jnp.minimum((idx_base + i) & (TABLE_ROWS - 1),
                                 TABLE_ROWS - g)
                out = dma_gather(ix, table, chunk=512, q=q, g=g)
                return acc + jnp.sum(out[0].astype(jnp.float32))

            fn = jax.jit(lambda loop_body=loop_body: jax.lax.fori_loop(
                0, ITERS, loop_body, jnp.float32(0)))
            try:
                np.asarray(fn())
            except Exception as e:  # noqa: BLE001 — probe survives
                print(f"dma g={g} q={q} {dtname}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                continue
            run_case(f"dma row-gather g={g} q={q} F={F} {dtname}",
                     fn, M, ITERS)

        # production-shaped: indices DMA'd HBM->SMEM per chunk
        def loop_body_ix(i, acc):
            ix = (idx_base + i) & (TABLE_ROWS - 1)
            out = dma_gather_idxdma(ix, table, chunk=512, q=16)
            return acc + jnp.sum(out[0].astype(jnp.float32))

        fn = jax.jit(lambda: jax.lax.fori_loop(
            0, ITERS, loop_body_ix, jnp.float32(0)))
        try:
            np.asarray(fn())
            run_case(f"dma idxdma g=1 q=16 F={F} {dtname}", fn, M, ITERS)
        except Exception as e:  # noqa: BLE001
            print(f"dma idxdma {dtname}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
