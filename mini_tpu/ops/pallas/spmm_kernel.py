"""Pallas TPU kernel: contiguous-segment sum as one-hot matmul on the MXU.

This is the TPU-native replacement for moderngpu's ``lbs_segreduce``
(`/root/reference/gunrock/src/neighborhood.hxx:58`): the reference
load-balances ragged segments across CTAs with merge-path search; on TPU we
exploit that CSC-ordered edges make every destination segment *contiguous*,
so for each 128-row output tile the covering edge range is
``[offsets[v0], offsets[v0+128])`` and the segment sum over an edge chunk is

    out_tile += one_hot(dst - v0) @ messages_chunk        # (128,E) @ (E,F)

— a matmul, which the MXU does at speed-of-light.  Load balancing is
implicit: work per tile is proportional to its edge count, and hub vertices
simply run more chunks (double-buffered DMA keeps the MXU fed).

The gather phase (``messages = w * x[srcs]``) runs in XLA before the kernel;
fusing it would require per-edge row DMAs which lose to XLA's native gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 128  # output rows per grid step
EDGE_CHUNK = 128  # edges per DMA/matmul chunk
N_BUF = 2  # double buffering


def _segsum_kernel(
    bounds_ref,  # SMEM int32[n_tiles+1]: offsets at ROW_TILE boundaries
    # (prefetching the full offsets array overflows the 1 MB SMEM past
    # n ~ 260K; the kernel only ever reads tile-boundary offsets)
    msgs_hbm,  # ANY  float32[m_pad, F]
    dsts_hbm,  # ANY  int32[m_pad // EDGE_CHUNK, EDGE_CHUNK]
    out_ref,  # VMEM float32[ROW_TILE, F]
    msg_buf,  # VMEM float32[N_BUF, EDGE_CHUNK, F]
    dst_buf,  # VMEM int32[N_BUF, 1, EDGE_CHUNK]
    sems,  # DMA sems [N_BUF, 2]
):
    i = pl.program_id(0)
    v0 = i * ROW_TILE
    start = bounds_ref[i]
    end = bounds_ref[i + 1]
    c0 = start // EDGE_CHUNK
    c1 = pl.cdiv(end, EDGE_CHUNK)  # exclusive chunk bound

    out_ref[:] = jnp.zeros_like(out_ref)

    def msg_dma(slot, c):
        return pltpu.make_async_copy(
            msgs_hbm.at[pl.ds(c * EDGE_CHUNK, EDGE_CHUNK), :],
            msg_buf.at[slot],
            sems.at[slot, 0],
        )

    def dst_dma(slot, c):
        return pltpu.make_async_copy(
            dsts_hbm.at[pl.ds(c, 1), :],
            dst_buf.at[slot],
            sems.at[slot, 1],
        )

    @pl.when(c0 < c1)
    def _():
        msg_dma(0, c0).start()
        dst_dma(0, c0).start()

        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (ROW_TILE, EDGE_CHUNK), 0
        )

        def body(c, acc):
            slot = (c - c0) % N_BUF
            nxt = (c - c0 + 1) % N_BUF

            @pl.when(c + 1 < c1)
            def _():
                msg_dma(nxt, c + 1).start()
                dst_dma(nxt, c + 1).start()

            msg_dma(slot, c).wait()
            dst_dma(slot, c).wait()
            local = dst_buf[slot][0] - v0  # (EDGE_CHUNK,)
            onehot = (local[None, :] == row_ids).astype(msg_buf.dtype)
            # f32 messages: HIGHEST so the MXU does not truncate them to
            # bf16 (segment sums feed bitwise-validated algorithms).
            # bf16 messages (GNN fast path): native bf16 x bf16 -> f32.
            precision = (
                jax.lax.Precision.HIGHEST
                if msg_buf.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            )
            return acc + jax.lax.dot_general(
                onehot,
                msg_buf[slot],
                (((1,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(
            c0, c1, body, jnp.zeros_like(out_ref), unroll=False
        )
        out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def segment_sum_pallas(
    offsets: jnp.ndarray,  # int32[n_pad+1]
    dsts: jnp.ndarray,  # int32[m_pad] (CSC-order segment ids, sorted)
    msgs: jnp.ndarray,  # float32/bfloat16 [m_pad, F]
    interpret: bool = False,
) -> jnp.ndarray:
    """out[v, :] = sum(msgs[offsets[v]:offsets[v+1], :]) for contiguous,
    sorted segments.  Requires n_pad % 128 == 0, m_pad % 128 == 0,
    F % 128 == 0."""
    m_pad, F = msgs.shape
    n_pad = offsets.shape[0] - 1
    assert n_pad % ROW_TILE == 0 and m_pad % EDGE_CHUNK == 0
    dsts2d = dsts.reshape(m_pad // EDGE_CHUNK, EDGE_CHUNK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // ROW_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (ROW_TILE, F), lambda i, off: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, EDGE_CHUNK, F), msgs.dtype),
            pltpu.VMEM((N_BUF, 1, EDGE_CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((N_BUF, 2)),
        ],
    )
    flops = 2 * m_pad * ROW_TILE * F
    return pl.pallas_call(
        _segsum_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, F), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=m_pad * F * 4 + n_pad * F * 4 + m_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(offsets.astype(jnp.int32)[::ROW_TILE], msgs, dsts2d)


def spmm_pallas(
    offsets: jnp.ndarray,
    gather_ids: jnp.ndarray,
    w: jnp.ndarray,
    x: jnp.ndarray,
    seg_ids: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pull-SpMM: XLA gather for messages + Pallas MXU segment sum.

    Cast ``x`` to bfloat16 beforehand for the GNN fast path (~35% faster:
    the gather moves half the bytes and the MXU skips the 6-pass f32
    emulation); accumulation stays f32 either way."""
    msgs = x[gather_ids] * w[:, None].astype(x.dtype)
    if seg_ids is None:
        seg_ids = _dst_ids_from_offsets(offsets, gather_ids.shape[0])
    if msgs.dtype not in (jnp.float32, jnp.bfloat16):
        msgs = msgs.astype(jnp.float32)
    return segment_sum_pallas(offsets, seg_ids, msgs, interpret=interpret)


def _dst_ids_from_offsets(offsets: jnp.ndarray, m_pad: int) -> jnp.ndarray:
    """Recover sorted segment ids from offsets (searchsorted)."""
    return (
        jnp.searchsorted(
            offsets[1:].astype(jnp.int32),
            jnp.arange(m_pad, dtype=jnp.int32),
            side="right",
        )
    ).astype(jnp.int32)
