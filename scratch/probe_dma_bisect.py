"""Bisect which construct in the row-DMA gather crashes remote Mosaic.

Variants (all tiny: M=2048, chunk=512, table 1024x128 f32):
  A  baseline probe kernel (SMEM blocked idx in_spec, DMA into pipelined
     VMEM out block)
  B  idx via PrefetchScalarGridSpec scalar-prefetch instead of blocked SMEM
  C  DMA into VMEM scratch, vector-copy scratch -> out block
  D  B + C
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK, Q, F = 512, 8, 128


def _ring(dma, nd):
    for d in range(min(Q, nd)):
        dma(d).start()

    def body(j, _):
        @pl.when(j + Q < nd)
        def _():
            dma(j + Q).start()

        dma(j).wait()
        return 0

    jax.lax.fori_loop(0, nd, body, 0, unroll=False)


def kern_direct(idx_ref, table_ref, out_ref, sems):
    def dma(j):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[j], 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[jax.lax.rem(j, Q)],
        )

    _ring(dma, CHUNK)


def kern_scratch(idx_ref, table_ref, out_ref, buf, sems):
    def dma(j):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[j], 1), :],
            buf.at[pl.ds(j, 1), :],
            sems.at[jax.lax.rem(j, Q)],
        )

    _ring(dma, CHUNK)
    out_ref[:] = buf[:]


def kern_prefetch_direct(idx_ref, table_ref, out_ref, sems):
    i = pl.program_id(0)

    def dma(j):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[i * CHUNK + j], 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[jax.lax.rem(j, Q)],
        )

    _ring(dma, CHUNK)


def kern_prefetch_scratch(idx_ref, table_ref, out_ref, buf, sems):
    i = pl.program_id(0)

    def dma(j):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[i * CHUNK + j], 1), :],
            buf.at[pl.ds(j, 1), :],
            sems.at[jax.lax.rem(j, Q)],
        )

    _ring(dma, CHUNK)
    out_ref[:] = buf[:]


def try_variant(name, build):
    try:
        out = build()
        out.block_until_ready()
        np.asarray(out[:1, :1])
        print(f"{name}: OK", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return False


def main():
    print("backend:", jax.default_backend(), flush=True)
    M, T = 2048, 1024
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(T, F), jnp.float32)
    idx = jnp.asarray(rng.randint(0, T, M), jnp.int32)
    ref = np.asarray(table)[np.asarray(idx)]

    def blocked(kern, scratch):
        sh = [pltpu.SemaphoreType.DMA((Q,))]
        if scratch:
            sh.insert(0, pltpu.VMEM((CHUNK, F), jnp.float32))
        return pl.pallas_call(
            kern,
            grid=(M // CHUNK,),
            in_specs=[
                pl.BlockSpec((CHUNK,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((CHUNK, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=sh,
            out_shape=jax.ShapeDtypeStruct((M, F), jnp.float32),
        )(idx, table)

    def prefetch(kern, scratch):
        sh = [pltpu.SemaphoreType.DMA((Q,))]
        if scratch:
            sh.insert(0, pltpu.VMEM((CHUNK, F), jnp.float32))
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(M // CHUNK,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((CHUNK, F), lambda i, ix: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=sh,
        )
        return pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((M, F), jnp.float32),
        )(idx, table)

    cases = [
        ("A smem-blocked -> out-block DMA",
         lambda: blocked(kern_direct, False)),
        ("B prefetch    -> out-block DMA",
         lambda: prefetch(kern_prefetch_direct, False)),
        ("C smem-blocked -> scratch DMA",
         lambda: blocked(kern_scratch, True)),
        ("D prefetch    -> scratch DMA",
         lambda: prefetch(kern_prefetch_scratch, True)),
    ]
    for name, build in cases:
        if try_variant(name, build):
            out = np.asarray(build())
            print(f"   correct: {np.array_equal(out, ref)}", flush=True)


if __name__ == "__main__":
    main()
