"""The sorted frontier engine: high-level data-movement helpers used by all
algorithm kernels.

Everything is built from three vector-speed primitives (ops/permute.py):
expansion along the sorted axis, one static-keyed sort for the CSR<->CSC
order switch, and cumsum/scan segmented reductions.  No per-edge XLA
gather/scatter appears anywhere on the hot path (measured ~7-8 ns/element on
TPU — see ops/permute.py docstring).

Edge-order conventions: "csc" = edges sorted by (dst, src) — per-dst
segments contiguous; "csr" = sorted by (src, dst).
"""

from __future__ import annotations

import jax.numpy as jnp

from mini_tpu.graph.csr import GraphSlice
from mini_tpu.ops.permute import (
    expand_to_edges,
    apply_fixed_perm,
    apply_fixed_perm_bit,
    segmented_scan_reduce,
)
from mini_tpu.ops.segment import contiguous_segment_sum


def _segreduce(g, edge_vals, seg_ids, offsets, op, ident, max_seg_len):
    # NOTE: a Pallas broadcast-compare segmented min/max/bor kernel exists
    # (ops/pallas/segreduce_kernel.py) but measured 16 ms vs this scan's
    # 2 ms at 4M edges on v5e (the m x 128 row-compare is VPU-bound and
    # its 8 KB chunk DMAs are latency-bound), so the scan stays the
    # production path.
    return segmented_scan_reduce(
        edge_vals, seg_ids, offsets, op, ident, max_seg_len=max_seg_len
    )


def src_vals_to_csc(g: GraphSlice, vertex_vals: jnp.ndarray, *more):
    """per-edge value[src(e)] in CSC order: expand along CSR (sorted by
    src), then switch order with the static-rank sort.  Extra arrays ride
    the same sort as additional payloads."""
    from mini_tpu.utils.profiling import scope

    with scope("engine.src_to_csc"):
        expanded = [
            expand_to_edges(v, g.row_offsets, g.m_pad)
            for v in (vertex_vals,) + more
        ]
        return apply_fixed_perm(g.csr_to_csc_rank, *expanded)


def src_bits_to_csc(g: GraphSlice, bits: jnp.ndarray) -> jnp.ndarray:
    """per-edge BOOL value[src(e)] in CSC order, cheaper than
    :func:`src_vals_to_csc`: the bit packs INTO the sort key (one
    single-array sort instead of key+payload — ops/permute.py)."""
    b_csr = expand_to_edges(bits.astype(jnp.int32), g.row_offsets, g.m_pad)
    return apply_fixed_perm_bit(g.csr_to_csc_rank * 2, b_csr) > 0


def dst_vals_to_csc(g: GraphSlice, vertex_vals: jnp.ndarray) -> jnp.ndarray:
    """per-edge value[dst(e)] in CSC order: pure expansion (dst sorted)."""
    from mini_tpu.utils.profiling import scope

    with scope("engine.expand_dst"):
        return expand_to_edges(vertex_vals, g.col_offsets, g.m_pad)


def src_vals_to_csr(g: GraphSlice, vertex_vals: jnp.ndarray) -> jnp.ndarray:
    """per-edge value[src(e)] in CSR order: pure expansion (src sorted)."""
    return expand_to_edges(vertex_vals, g.row_offsets, g.m_pad)


def dst_vals_to_csr(g: GraphSlice, vertex_vals: jnp.ndarray, *more):
    """per-edge value[dst(e)] in CSR order: expand along CSC, then switch
    with the inverse rank (csc_eids = CSR position of each CSC edge)."""
    expanded = [
        expand_to_edges(v, g.col_offsets, g.m_pad)
        for v in (vertex_vals,) + more
    ]
    return apply_fixed_perm(g.csc_eids, *expanded)


def reduce_csc_by_dst(
    g: GraphSlice,
    edge_vals: jnp.ndarray,
    op: str,
    identity=None,
) -> jnp.ndarray:
    """Segmented reduce of CSC-ordered per-edge values into [n_pad] dst
    slots: or/and/int-sum via cumsum-difference, min/max/float-sum via one
    associative scan."""
    if op == "or":
        s = contiguous_segment_sum(
            edge_vals.astype(jnp.int32), g.col_offsets
        )
        return s > 0
    if op == "sum" and jnp.issubdtype(edge_vals.dtype, jnp.integer):
        return contiguous_segment_sum(edge_vals, g.col_offsets)
    from mini_tpu.ops.segment import identity_for

    ident = (
        identity_for(op if op != "sum" else "sum", edge_vals.dtype)
        if identity is None
        else jnp.asarray(identity, edge_vals.dtype)
    )
    from mini_tpu.utils.profiling import scope

    with scope(f"engine.segreduce_dst.{op}"):
        return _segreduce(
            g, edge_vals, g.csc_dsts, g.col_offsets, op, ident,
            g.max_in_degree,
        )


def reduce_csr_by_src(
    g: GraphSlice,
    edge_vals: jnp.ndarray,
    op: str,
    identity=None,
) -> jnp.ndarray:
    if op == "or":
        s = contiguous_segment_sum(
            edge_vals.astype(jnp.int32), g.row_offsets
        )
        return s > 0
    if op == "sum" and jnp.issubdtype(edge_vals.dtype, jnp.integer):
        return contiguous_segment_sum(edge_vals, g.row_offsets)
    from mini_tpu.ops.segment import identity_for

    ident = (
        identity_for(op if op != "sum" else "sum", edge_vals.dtype)
        if identity is None
        else jnp.asarray(identity, edge_vals.dtype)
    )
    return _segreduce(
        g, edge_vals, g.csr_srcs, g.row_offsets, op, ident,
        g.max_out_degree,
    )
