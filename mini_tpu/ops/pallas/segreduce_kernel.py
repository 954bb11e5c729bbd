"""Pallas TPU kernel: scalar contiguous-segment reduce (min/max/sum/
bitwise-or).

The feature-valued segment sum rides the MXU as a one-hot matmul
(spmm_kernel.py); min/max/or have no matmul form, and the XLA fallback (a
Hillis-Steele segmented scan, ops/permute.py) costs log2(max_degree) full
passes over the edge array — ~5 ms for 2M edges at max degree 46K.  This
kernel does ONE pass: for each 128-row output tile, sweep the covering
CSC/CSR edge span in fixed chunks, broadcast-compare the chunk's segment
ids against the tile's rows, and fold the masked values with a log-step
sublane reduction.  Same double-buffered DMA skeleton as the segment-sum
kernel; this is the TPU re-expression of the remaining moderngpu
``lbs_segreduce`` reduce ops (`/root/reference/gunrock/src/neighborhood.hxx:58`
with ``minimum_t``/``maximum_t``) and the relax min of SSSP
(`/root/reference/gunrock/src/intrinsics.hxx:12-22`).

MEASURED OUTCOME (v5e, 4M edges, avg degree 64): 16 ms vs the scan's
2 ms — the m x 128 broadcast compare is VPU-compute-bound and the 8 KB
chunk DMAs are latency-bound, so the Hillis-Steele scan remains the
production path (ops/engine._segreduce).  Kept, with interpret-mode CI
coverage, as the load-balanced-reduce parity kernel and as the starting
point if a future Mosaic gains an in-register segmented-scan primitive.

Layout notes (hard-won): any minor dim < 128 gets lane-padded, and a DMA
slice must take full (or tiling-aligned) final dims whether Mosaic keeps
the operand in HBM (tiling (1, 128)) or promotes it to VMEM ((8, 128)) —
so edge arrays are fed as [m_pad/1024, 8, 128] and each chunk DMA moves
one full (8, 128) block of 1024 edges.  Inside a chunk the 8 lane-rows
are unrolled: each row broadcast-compares its 128 edges (lanes) against
the tile's 128 rows (sublanes) and folds lanes log-step into a [128, 1]
accumulator, which lands in the output block with one tiny relayout per
tile.  Output blocks must be (8, 128)-aligned, so each grid step owns
``TILES_PER_BLOCK = 8`` consecutive 128-row tiles (unrolled); the
trailing partial block clamps its offset reads and its rows are sliced
away by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 128  # output rows per tile
TILES_PER_BLOCK = 8  # row tiles per grid step (8x128 output block)
EDGE_CHUNK = 1024  # edges per DMA chunk (one (8, 128) block)
SUB_ROWS = 8
N_BUF = 2

_OPS = {
    "min": jnp.minimum,
    "max": jnp.maximum,
    "sum": jnp.add,
    "bor": jnp.bitwise_or,
}


def _fold_lanes(x, fn):
    """Log-step reduction along the lane (last) axis — explicit slicing,
    which Mosaic lowers for every combine fn uniformly."""
    k = x.shape[-1]
    while k > 1:
        k //= 2
        x = fn(x[:, :k], x[:, k:])
    return x  # [rows, 1]


def _segreduce_kernel(
    bounds_ref,  # SMEM int32[n_tiles+1]: offsets at ROW_TILE boundaries
    # (the full offsets array overflows 1 MB SMEM past n ~ 260K)
    vals_hbm,  # ANY [m_pad // EDGE_CHUNK, SUB_ROWS, 128]
    dsts_hbm,  # ANY int32[m_pad // EDGE_CHUNK, SUB_ROWS, 128]
    out_ref,  # VMEM [TILES_PER_BLOCK, ROW_TILE]
    val_buf,  # VMEM [N_BUF, 1, SUB_ROWS, 128]
    dst_buf,  # VMEM int32[N_BUF, 1, SUB_ROWS, 128]
    sems,  # DMA sems [N_BUF, 2]
    *,
    op: str,
    ident,
    n_pad: int,
):
    i = pl.program_id(0)
    fn = _OPS[op]
    out_ref[:] = jnp.full_like(out_ref, ident)
    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (ROW_TILE, 128), 0
    )
    identf = jnp.full((), ident, val_buf.dtype)

    def val_dma(slot, c):
        return pltpu.make_async_copy(
            vals_hbm.at[pl.ds(c, 1)], val_buf.at[slot], sems.at[slot, 0]
        )

    def dst_dma(slot, c):
        return pltpu.make_async_copy(
            dsts_hbm.at[pl.ds(c, 1)], dst_buf.at[slot], sems.at[slot, 1]
        )

    for t in range(TILES_PER_BLOCK):
        tg = i * TILES_PER_BLOCK + t
        v0 = tg * ROW_TILE
        # trailing partial block: clamp bound reads; start==end skips
        n_tiles = n_pad // ROW_TILE
        start = bounds_ref[jnp.minimum(tg, n_tiles)]
        end = bounds_ref[jnp.minimum(tg + 1, n_tiles)]
        c0 = start // EDGE_CHUNK
        c1 = pl.cdiv(end, EDGE_CHUNK)

        @pl.when(c0 < c1)
        def _():
            val_dma(0, c0).start()
            dst_dma(0, c0).start()

            def body(c, acc):
                slot = (c - c0) % N_BUF
                nxt = (c - c0 + 1) % N_BUF

                @pl.when(c + 1 < c1)
                def _():
                    val_dma(nxt, c + 1).start()
                    dst_dma(nxt, c + 1).start()

                val_dma(slot, c).wait()
                dst_dma(slot, c).wait()
                for srow in range(SUB_ROWS):
                    # 128 edges in lanes vs 128 tile rows in sublanes;
                    # out-of-tile edges mask to the identity
                    local = dst_buf[slot][0, srow][None, :] - v0
                    sel = jnp.where(
                        local == row_ids,
                        val_buf[slot][0, srow][None, :],
                        identf,
                    )  # (ROW_TILE, 128)
                    acc = fn(acc, _fold_lanes(sel, fn))
                return acc

            acc0 = jnp.full((ROW_TILE, 1), ident, val_buf.dtype)
            acc = jax.lax.fori_loop(c0, c1, body, acc0, unroll=False)
            out_ref[t, :] = acc[:, 0]


def _default_identity(op: str, dtype) -> float | int:
    if op == "sum" or op == "bor":
        return 0
    if jnp.issubdtype(dtype, jnp.floating):
        return float("inf") if op == "min" else float("-inf")
    info = jnp.iinfo(dtype)
    return int(info.max) if op == "min" else int(info.min)


def segment_reduce_pallas(
    offsets: jnp.ndarray,  # int32[n_pad+1]
    dsts: jnp.ndarray,  # int32[m_pad] sorted segment ids
    vals: jnp.ndarray,  # [m_pad] f32 / i32 / u32
    op: str,
    identity=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[v] = reduce_op(vals[offsets[v]:offsets[v+1]]) for contiguous,
    sorted segments; empty segments get the identity.  Requires
    n_pad % 128 == 0 and m_pad % 512 == 0."""
    if identity is None:
        identity = _default_identity(op, vals.dtype)
    # the identity must be a static Python scalar: the kernel closure
    # bakes it into the Mosaic program
    ident = (
        float(identity)
        if jnp.issubdtype(vals.dtype, jnp.floating)
        else int(identity)
    )
    return _segment_reduce_pallas(offsets, dsts, vals, op, ident, interpret)


@functools.partial(jax.jit, static_argnames=("op", "ident", "interpret"))
def _segment_reduce_pallas(
    offsets, dsts, vals, op: str, ident, interpret: bool
) -> jnp.ndarray:
    m_pad = vals.shape[0]
    n_pad = offsets.shape[0] - 1
    assert n_pad % ROW_TILE == 0 and m_pad % EDGE_CHUNK == 0
    n_tiles = n_pad // ROW_TILE
    n_blocks = pl.cdiv(n_tiles, TILES_PER_BLOCK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TILES_PER_BLOCK, ROW_TILE),
            lambda i, off: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, 1, SUB_ROWS, 128), vals.dtype),
            pltpu.VMEM((N_BUF, 1, SUB_ROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((N_BUF, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _segreduce_kernel, op=op, ident=ident, n_pad=n_pad
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * TILES_PER_BLOCK, ROW_TILE), vals.dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * ROW_TILE,
            bytes_accessed=m_pad * 8 + n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        offsets.astype(jnp.int32)[::ROW_TILE],
        vals.reshape(m_pad // EDGE_CHUNK, SUB_ROWS, 128),
        dsts.reshape(m_pad // EDGE_CHUNK, SUB_ROWS, 128).astype(jnp.int32),
    )
    return out.reshape(-1)[:n_pad]
