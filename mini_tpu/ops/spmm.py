"""SpMM and SDDMM over the graph slice — the feature-valued generalization of
neighborhood-reduce (cf. `/root/reference/gunrock/src/neighborhood.hxx:13-70`,
whose scalar ``Value`` reduce is the F=1 special case), powering both
PageRank-style rank aggregation and GNN message passing.

Two implementations:

* ``xla``: gather + sorted segment-sum.  XLA fuses the weight multiply into
  the gather; the scatter-add is sorted (CSC order) and deterministic.
* ``pallas``: contiguous-segment-sum-as-matmul kernel: per 128-row output
  tile, the covering CSC edge span is swept in fixed chunks and reduced with
  a one-hot(dst) @ messages matmul on the MXU (see ops/pallas/spmm_kernel.py).

Both compute, for direction="pull":
    out[v, :] = reduce_{e=(u,v) in E} w[e] * X[u, :]
and for direction="push":
    out[u, :] = reduce_{e=(u,v) in E} w[e] * X[v, :]
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from mini_tpu.graph.csr import GraphSlice
from mini_tpu.ops.segment import segment_reduce


def spmm(
    g: GraphSlice,
    x: jnp.ndarray,
    direction: str = "pull",
    weights: Optional[jnp.ndarray] = None,
    op: str = "sum",
    impl: str = "auto",
) -> jnp.ndarray:
    """Sparse (adjacency) times dense (features): [n_pad, F] -> [n_pad, F].

    ``weights`` overrides the graph's edge weights; it must be in the edge
    order of the chosen direction (CSC for pull, CSR for push).
    """
    if x.ndim == 1:
        return spmm(
            g, x[:, None], direction=direction, weights=weights, op=op,
            impl=impl,
        )[:, 0]

    if impl == "auto":
        impl = "pallas" if (op == "sum" and _pallas_ok(g, x)) else "xla"

    if direction == "pull":
        seg, gather_ids = g.csc_dsts, g.csc_srcs
        w = g.csc_weights if weights is None else weights
        mask = g.edge_mask_csc
    elif direction == "push":
        seg, gather_ids = g.csr_srcs, g.csr_dsts
        w = g.csr_weights if weights is None else weights
        mask = g.edge_mask
    else:
        raise ValueError(f"unknown direction {direction!r}")

    if impl == "pallas":
        if op == "sum" and _pallas_shapes_ok(g, x):
            from mini_tpu.ops.pallas.spmm_kernel import spmm_pallas

            offsets = g.col_offsets if direction == "pull" else g.row_offsets
            return spmm_pallas(offsets, gather_ids, w, x, seg_ids=seg)
        impl = "xla"  # graceful fallback (F not lane-aligned, etc.)

    msgs = x[gather_ids] * w[:, None].astype(x.dtype)
    return segment_reduce(msgs, seg, g.n_pad, op, mask=mask[:, None])


def _pallas_shapes_ok(g: GraphSlice, x: jnp.ndarray) -> bool:
    return (
        x.shape[-1] % 128 == 0
        and g.n_pad % 128 == 0
        and g.m_pad % 128 == 0
    )


def _pallas_ok(g: GraphSlice, x: jnp.ndarray) -> bool:
    import jax

    if jax.default_backend() not in ("tpu",):
        return False
    return _pallas_shapes_ok(g, x)


def sddmm(
    g: GraphSlice,
    xl: jnp.ndarray,
    xr: Optional[jnp.ndarray] = None,
    order: str = "csr",
) -> jnp.ndarray:
    """Sampled dense-dense product: per-edge <xl[src], xr[dst]> over the
    sparsity pattern — the shape of L-Spar's per-edge similarity step
    (`lspar/lspar_functor.hxx:28-33`) and of GNN edge scoring.

    Returns float[m_pad] in the requested edge order.
    """
    xr = xl if xr is None else xr
    if order == "csr":
        src, dst, mask = g.csr_srcs, g.csr_dsts, g.edge_mask
    elif order == "csc":
        src, dst, mask = g.csc_srcs, g.csc_dsts, g.edge_mask_csc
    else:
        raise ValueError(f"unknown order {order!r}")
    if xl.ndim == 1:
        vals = xl[src] * xr[dst]
    else:
        vals = jnp.sum(xl[src] * xr[dst], axis=-1)
    return jnp.where(mask, vals, 0)
