"""Pallas TPU kernel: banded, staircase-one-hot segment sum (SpMM core).

TPU-native replacement for moderngpu's ``lbs_segreduce``
(`/root/reference/gunrock/src/neighborhood.hxx:58`), round 2.  Differences
from the round-1 kernel (``spmm_kernel.py``):

* K dst-sorted message streams (one per source band — see
  ``graph/banded.py``) are folded into one output so the message gather
  upstream stays on the fast (<=16 MB table) XLA path: 2M-row f32 gathers
  measured 24 ms whole-table vs 6.8 ms banded (scratch/bench_gather*).
* The per-edge ``dsts`` array is gone: each 128-row output tile DMAs its
  128 segment offsets and builds the one-hot "staircase" by comparing the
  edge index against offset boundaries — the one-hot of a SORTED segment
  id chunk is exactly ``off[r] <= j < off[r+1]``.  Edges of neighboring
  tiles inside a shared chunk fail both comparisons and vanish.
* EDGE_CHUNK is 512 (the 128-edge kernel measured DMA-issue-bound at
  ~600 ns/step), and the weight multiply is folded into the gather
  upstream (measured free there).
* f32 messages use a 2x bf16 split by default (hi + residual, ~1e-6
  relative error, 2 MXU passes) instead of 6-pass HIGHEST emulation;
  ``precision="highest"`` restores near-exact f32 for oracle checks.

Accumulation is always f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 128
EDGE_CHUNK = 512
N_BUF = 2


def _chunk_matmul(stair, m, precision, msg_dtype):
    """acc-contribution = stairᵀ @ m with the configured precision."""
    if precision == "highest" and msg_dtype == jnp.float32:
        return jax.lax.dot_general(
            stair.astype(jnp.float32), m, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    oh = stair.astype(jnp.bfloat16)
    if msg_dtype == jnp.float32 and precision == "split":
        hi = m.astype(jnp.bfloat16)
        lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            oh, hi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            oh, lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # bf16 messages (or f32 with precision="fast": bf16-truncated)
    return jax.lax.dot_general(
        oh, m.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def banded_segment_sum(
    bounds: jnp.ndarray,  # int32[K, n_tiles+1]
    offs2d: jnp.ndarray,  # int32[n_tiles, K, ROW_TILE]
    msgs: tuple,  # K arrays [mk_pad, F], all same dtype
    precision: str = "split",  # "split" | "highest" | "fast"
    interpret: bool = False,
    edge_chunk: int = EDGE_CHUNK,  # must match the layout's padding
    n_buf: int = N_BUF,
    cross_band_prefetch: bool = True,
) -> jnp.ndarray:
    """out[v] = sum over the K dst-sorted message streams of all messages
    whose segment is v.  Returns float32[n_tiles*ROW_TILE, F].

    ``cross_band_prefetch`` (round 5, VERDICT #8): band k+1's pipeline
    fill is issued BEFORE band k's compute loop, into the other half of
    a parity-alternating buffer pair, so only each tile's FIRST band pays
    an exposed first-chunk DMA latency (was: every (tile, band) pair).
    No cross-grid-step semaphore state — the parity swap stays inside one
    grid step.  Costs 2x the message-buffer VMEM (2*N_BUF*C*F)."""
    msgs = tuple(msgs)
    K = len(msgs)
    n_tiles = bounds.shape[1] - 1
    F = msgs[0].shape[1]
    msg_dtype = msgs[0].dtype
    C = edge_chunk
    N_BUF_ = n_buf
    NPAR = 2 if (cross_band_prefetch and K > 1) else 1
    m_total = sum(int(mk.shape[0]) for mk in msgs)

    def kernel(bounds_ref, offs_ref, *rest):
        # offs_ref: auto-pipelined VMEM block (1, K, ROW_TILE) — this
        # tile's per-band dst offsets.  (Manually DMA-ing it per band
        # cost ~2 us latency x K bands x n_tiles ≈ 40% of kernel time.)
        msgs_refs = rest[:K]
        out_ref = rest[K]
        msg_buf = rest[K + 1]  # VMEM (NPAR, N_BUF, C, F)
        sems = rest[K + 2]  # DMA (NPAR, N_BUF)

        i = pl.program_id(0)
        jg_col = jax.lax.broadcasted_iota(jnp.int32, (C, ROW_TILE), 0)
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (ROW_TILE, 1), 0
        )
        out_ref[:] = jnp.zeros((ROW_TILE, F), jnp.float32)

        def make_mdma(k, par):
            def mdma(slot, c):
                return pltpu.make_async_copy(
                    msgs_refs[k].at[pl.ds(c * C, C), :],
                    msg_buf.at[par, slot],
                    sems.at[par, slot],
                )

            return mdma

        def fill(k, par):
            """Issue band k's (n_buf-1)-deep pipeline fill into parity
            ``par``'s buffers."""
            start = bounds_ref[k, i]
            end = bounds_ref[k, i + 1]
            c0 = start // C
            c1 = pl.cdiv(end, C)
            mdma = make_mdma(k, par)
            for d in range(N_BUF_ - 1):
                @pl.when((c0 + d < c1))
                def _(d=d, c0=c0, mdma=mdma):
                    mdma(d % N_BUF_, c0 + d).start()

        if NPAR == 2:
            fill(0, 0)  # band 0: the one exposed fill per tile

        for k in range(K):  # static unroll over bands
            par = k % NPAR
            start = bounds_ref[k, i]
            end = bounds_ref[k, i + 1]
            c0 = start // C
            c1 = pl.cdiv(end, C)
            mdma = make_mdma(k, par)

            if NPAR == 2:
                if k + 1 < K:
                    # overlap the NEXT band's fill with this band's
                    # compute (the other parity's buffers are idle)
                    fill(k + 1, (k + 1) % NPAR)
            else:
                fill(k, par)

            @pl.when(c0 < c1)
            def _(k=k, par=par, start=start, end=end, c0=c0, c1=c1,
                  mdma=mdma):
                off = offs_ref[0, k].reshape(1, ROW_TILE)
                nxt = jnp.concatenate(
                    [off[:, 1:], jnp.full((1, 1), end, jnp.int32)],
                    axis=1,
                )

                def body(c, _):
                    slot = (c - c0) % N_BUF_
                    ahead = c + N_BUF_ - 1

                    @pl.when(ahead < c1)
                    def _():
                        mdma((ahead - c0) % N_BUF_, ahead).start()

                    mdma(slot, c).wait()
                    lo = c * C
                    # PURE chunk: every edge lives in ONE row's span (a
                    # hub segment covering the whole chunk) — 27-43% of
                    # RMAT edges.  The one-hot matmul degenerates to a
                    # rank-1 update: VPU column-sum + outer-product
                    # accumulate (~100 cycles vs the ~512-cycle MXU
                    # pass), and the f32 column-sum is EXACT — no bf16
                    # split needed.
                    interior = (lo >= start) & (lo + C <= end)
                    crossing = jnp.any((off > lo) & (off < lo + C))
                    pure = interior & jnp.logical_not(crossing)

                    @pl.when(pure)
                    def _():
                        r = jnp.sum((off <= lo).astype(jnp.int32)) - 1
                        colsum = jnp.sum(
                            msg_buf[par, slot].astype(jnp.float32),
                            axis=0,
                        )
                        onehot = jnp.where(
                            row_iota == r, jnp.float32(1), jnp.float32(0)
                        )
                        out_ref[:] = out_ref[:] + onehot * colsum[None, :]

                    @pl.when(jnp.logical_not(pure))
                    def _():
                        jg = jg_col + lo
                        stair = (jg >= off) & (jg < nxt)
                        out_ref[:] = out_ref[:] + _chunk_matmul(
                            stair, msg_buf[par, slot], precision,
                            msg_dtype,
                        )

                    return 0

                jax.lax.fori_loop(c0, c1, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, K, ROW_TILE), lambda i, bnd: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(K)],
        out_specs=pl.BlockSpec(
            (ROW_TILE, F), lambda i, bnd: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((NPAR, N_BUF_, C, F), msg_dtype),
            pltpu.SemaphoreType.DMA((NPAR, N_BUF_)),
        ],
    )
    passes = 1 if msg_dtype != jnp.float32 else (
        6 if precision == "highest" else 2
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles * ROW_TILE, F), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_total * ROW_TILE * F * passes,
            bytes_accessed=m_total * F * np.dtype(msg_dtype).itemsize
            + n_tiles * ROW_TILE * F * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bounds, offs2d, *msgs)


def _sddmm_chunk_matmul(m, y, precision, msg_dtype):
    """t[j, r] = <m[j, :], y[r, :]> with the configured precision.

    Unlike the forward's one-hot (exact in bf16), BOTH operands here are
    data, so "split" decomposes the messages into hi+lo bf16 halves and
    additionally corrects y's truncation (3 MXU passes, ~1e-5 relative)."""
    dn = (((1,), (1,)), ((), ()))
    if precision == "highest" and msg_dtype == jnp.float32:
        return jax.lax.dot_general(
            m, y.astype(jnp.float32), dn,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    if msg_dtype == jnp.float32 and precision == "split":
        y32 = y.astype(jnp.float32)
        mh = m.astype(jnp.bfloat16)
        ml = (m - mh.astype(jnp.float32)).astype(jnp.bfloat16)
        yh = y32.astype(jnp.bfloat16)
        yl = (y32 - yh.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            mh, yh, dn, preferred_element_type=jnp.float32
        )
        acc += jax.lax.dot_general(
            ml, yh, dn, preferred_element_type=jnp.float32
        )
        acc += jax.lax.dot_general(
            mh, yl, dn, preferred_element_type=jnp.float32
        )
        return acc
    return jax.lax.dot_general(
        m.astype(jnp.bfloat16), y.astype(jnp.bfloat16), dn,
        preferred_element_type=jnp.float32,
    )


def banded_sddmm(
    bounds: jnp.ndarray,  # int32[K, n_tiles+1]
    offs2d: jnp.ndarray,  # int32[n_tiles, K, ROW_TILE]
    msgs: tuple,  # K arrays [mk_pad, F] — gathered src rows, banded order
    y: jnp.ndarray,  # [n_tiles*ROW_TILE, F] — dst-side matrix
    precision: str = "split",
    interpret: bool = False,
    edge_chunk: int = EDGE_CHUNK,  # must match the layout's padding
) -> jnp.ndarray:
    """Per-edge dot products over the banded layout:

        dw[e] = <y[dst(e)], msgs[e]>

    — the SDDMM shape (L-Spar's similarity step,
    `/root/reference/gunrock/src/lspar/lspar_functor.hxx:28-33`) and exactly
    the weight cotangent of the banded SpMM.  Returns the FLAT banded edge
    stream float32[sum_k mk_pad] (band k's slot j at ``base_k + j``); map it
    back to CSC/CSR order with ``BandedLayout.permute_from_bands``.

    Same grid/DMA skeleton as the forward: each 128-dst output tile walks
    its per-band edge chunks, but instead of folding messages into dst rows
    it computes t = msgs_chunk @ y_tileᵀ on the MXU and row-sums it under
    the staircase mask.  A chunk straddling a tile boundary is touched by
    both tiles; the later one read-modify-writes (grid steps are sequential
    on a TPU core, so the RMW is race-free).
    """
    msgs = tuple(msgs)
    K = len(msgs)
    n_tiles = bounds.shape[1] - 1
    F = msgs[0].shape[1]
    msg_dtype = msgs[0].dtype
    C = edge_chunk
    base_chunks = []  # static flat chunk base per band
    b = 0
    for mk in msgs:
        base_chunks.append(b)
        b += int(mk.shape[0]) // C
    total_chunks = b

    def kernel(bounds_ref, offs_ref, *rest):
        # offs_ref: auto-pipelined VMEM block (1, K, ROW_TILE)
        msgs_refs = rest[:K]
        y_ref = rest[K]  # VMEM (ROW_TILE, F)
        out_ref = rest[K + 1]  # ANY [total_chunks, C]
        msg_buf = rest[K + 2]  # VMEM (N_BUF, C, F)
        acc_buf = rest[K + 3]  # VMEM (1, C) f32
        sems = rest[K + 4]  # DMA (N_BUF,)
        wsem = rest[K + 5]  # DMA ()

        i = pl.program_id(0)
        jg_col = jax.lax.broadcasted_iota(jnp.int32, (C, ROW_TILE), 0)
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (ROW_TILE, 1), 0
        )

        for k in range(K):  # static unroll over bands
            start = bounds_ref[k, i]
            end = bounds_ref[k, i + 1]
            c0 = start // C
            c1 = pl.cdiv(end, C)

            def mdma(slot, c, k=k):
                return pltpu.make_async_copy(
                    msgs_refs[k].at[pl.ds(c * C, C), :],
                    msg_buf.at[slot],
                    sems.at[slot],
                )

            @pl.when(c0 < c1)
            def _(k=k, start=start, end=end, c0=c0, c1=c1, mdma=mdma):
                for d in range(N_BUF - 1):  # n_buf-1-deep pipeline fill
                    @pl.when(c0 + d < c1)
                    def _(d=d):
                        mdma(d % N_BUF, c0 + d).start()
                off = offs_ref[0, k].reshape(1, ROW_TILE)
                nxt = jnp.concatenate(
                    [off[:, 1:], jnp.full((1, 1), end, jnp.int32)],
                    axis=1,
                )

                def body(c, _):
                    slot = (c - c0) % N_BUF
                    ahead = c + N_BUF - 1

                    @pl.when(ahead < c1)
                    def _():
                        mdma((ahead - c0) % N_BUF, ahead).start()

                    row = base_chunks[k] + c
                    lo = c * C
                    # a chunk whose first edge precedes this tile's range
                    # was already part-written by an earlier tile: RMW it
                    rmw = lo < start

                    @pl.when(rmw)
                    def _():
                        pltpu.make_async_copy(
                            out_ref.at[row], acc_buf, wsem
                        ).start()

                    mdma(slot, c).wait()
                    # PURE chunk (one hub row spans it — see the forward
                    # kernel): dw = <m[j], y[r*]> per edge, a VPU
                    # broadcast-multiply + row-reduce instead of the MXU
                    # pass; rmw implies not-pure, so the plain write is
                    # always safe here.
                    interior = (lo >= start) & (lo + C <= end)
                    crossing = jnp.any((off > lo) & (off < lo + C))
                    pure = interior & jnp.logical_not(crossing)

                    @pl.when(pure)
                    def _():
                        r = jnp.sum((off <= lo).astype(jnp.int32)) - 1
                        onehot = jnp.where(
                            row_iota == r, jnp.float32(1), jnp.float32(0)
                        )
                        yrow = jnp.sum(
                            y_ref[:].astype(jnp.float32) * onehot, axis=0
                        )
                        acc_buf[:] = jnp.broadcast_to(
                            jnp.sum(
                                msg_buf[slot].astype(jnp.float32)
                                * yrow[None, :],
                                axis=1,
                            )[None, :],
                            (8, C),
                        )

                    @pl.when(jnp.logical_not(pure))
                    def _():
                        jg = jg_col + lo
                        stair = (jg >= off) & (jg < nxt)
                        t = _sddmm_chunk_matmul(
                            msg_buf[slot], y_ref[:], precision, msg_dtype
                        )
                        contrib = jnp.sum(
                            jnp.where(stair, t, 0.0), axis=1
                        )[None, :]  # (1, C)

                        @pl.when(rmw)
                        def _():
                            pltpu.make_async_copy(
                                out_ref.at[row], acc_buf, wsem,
                            ).wait()
                            acc_buf[:] = acc_buf[:] + contrib

                        @pl.when(jnp.logical_not(rmw))
                        def _():
                            acc_buf[:] = jnp.broadcast_to(
                                contrib, (8, C)
                            )

                    wr = pltpu.make_async_copy(
                        acc_buf, out_ref.at[row], wsem
                    )
                    wr.start()
                    wr.wait()
                    return 0

                jax.lax.fori_loop(c0, c1, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, K, ROW_TILE), lambda i, bnd: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(K)]
        + [
            pl.BlockSpec(
                (ROW_TILE, F), lambda i, bnd: (i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, C, F), msg_dtype),
            # (8, C) with identical rows: a dynamic 1-row DMA slice of the
            # (8,128)-tiled out memref violates Mosaic's sublane alignment
            # when the ANY-space output is placed in VMEM (round-5 TPU
            # compile failure under the train step); indexing the UNTILED
            # leading dim of a 3D out (the forward's msg_buf.at[slot]
            # pattern) is always legal, at 8x the DMA bytes (~2 KB/chunk)
            pltpu.VMEM((8, C), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    passes = 1 if msg_dtype != jnp.float32 else (
        6 if precision == "highest" else 3
    )
    m_total = sum(int(mk.shape[0]) for mk in msgs)
    flat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((total_chunks, 8, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_total * ROW_TILE * F * passes,
            bytes_accessed=m_total * F * np.dtype(msg_dtype).itemsize
            + n_tiles * ROW_TILE * F * 4 + m_total * 4 * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bounds, offs2d, *msgs, y)[:, 0, :].reshape(-1)
    # Chunks past each band's written range [0, cdiv(real_mk, C)) are never
    # touched by any tile — pure padding left as garbage.  Mask them: the
    # band's real edge count is bounds[k, -1] (last tile's end), so a flat
    # slot is valid iff its band-local position < round_up(real_mk, C).
    # (Positions inside written chunks past real_mk are staircase-zeroed by
    # the kernel itself.)
    pos = jnp.arange(flat.shape[0], dtype=jnp.int32)
    valid = jnp.zeros(flat.shape[0], bool)
    b = 0
    for k, mk in enumerate(msgs):
        mk_pad = int(mk.shape[0])
        written = ((bounds[k, -1] + C - 1) // C) * C
        local = pos - b
        valid = valid | ((local >= 0) & (local < written))
        b += mk_pad
    return jnp.where(valid, flat, 0.0)
