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
    offs2d: jnp.ndarray,  # int32[K, n_tiles, ROW_TILE]
    msgs: tuple,  # K arrays [mk_pad, F], all same dtype
    precision: str = "split",  # "split" | "highest" | "fast"
    interpret: bool = False,
) -> jnp.ndarray:
    """out[v] = sum over the K dst-sorted message streams of all messages
    whose segment is v.  Returns float32[n_tiles*ROW_TILE, F]."""
    msgs = tuple(msgs)
    K = len(msgs)
    n_tiles = bounds.shape[1] - 1
    F = msgs[0].shape[1]
    msg_dtype = msgs[0].dtype
    C = EDGE_CHUNK
    m_total = sum(int(mk.shape[0]) for mk in msgs)

    def kernel(bounds_ref, offs2d_hbm, *rest):
        msgs_refs = rest[:K]
        out_ref = rest[K]
        msg_buf = rest[K + 1]  # VMEM (N_BUF, C, F)
        offs_buf = rest[K + 2]  # VMEM (1, ROW_TILE) int32
        sems = rest[K + 3]  # DMA (N_BUF,)
        osem = rest[K + 4]  # DMA ()

        i = pl.program_id(0)
        jg_col = jax.lax.broadcasted_iota(jnp.int32, (C, ROW_TILE), 0)
        out_ref[:] = jnp.zeros((ROW_TILE, F), jnp.float32)

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
                odma = pltpu.make_async_copy(
                    offs2d_hbm.at[k, pl.ds(i, 1), :], offs_buf, osem
                )
                odma.start()
                mdma(0, c0).start()
                odma.wait()
                off = offs_buf[:]  # (1, ROW_TILE)
                nxt = jnp.concatenate(
                    [off[:, 1:], jnp.full((1, 1), end, jnp.int32)],
                    axis=1,
                )

                def body(c, a):
                    slot = (c - c0) % N_BUF
                    nslot = (c - c0 + 1) % N_BUF

                    @pl.when(c + 1 < c1)
                    def _():
                        mdma(nslot, c + 1).start()

                    mdma(slot, c).wait()
                    jg = jg_col + c * C
                    stair = (jg >= off) & (jg < nxt)
                    return a + _chunk_matmul(
                        stair, msg_buf[slot], precision, msg_dtype
                    )

                acc = jax.lax.fori_loop(
                    c0, c1, body, jnp.zeros((ROW_TILE, F), jnp.float32)
                )
                out_ref[:] = out_ref[:] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(K)],
        out_specs=pl.BlockSpec(
            (ROW_TILE, F), lambda i, bnd: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, C, F), msg_dtype),
            pltpu.VMEM((1, ROW_TILE), jnp.int32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
            pltpu.SemaphoreType.DMA(()),
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
