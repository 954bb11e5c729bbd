from mini_tpu.ops.segment import (  # noqa: F401
    segment_reduce,
    segment_argmin_by,
    identity_for,
    exclusive_cumsum,
)
from mini_tpu.ops.frontier import Frontier, compact_mask, uniquify  # noqa: F401
from mini_tpu.ops.operators import (  # noqa: F401
    EdgeView,
    edges_by_dst,
    edges_by_src,
    advance,
    apply_to_dst,
    filter_frontier,
    neighborhood_reduce,
    compute,
)
from mini_tpu.ops.spmm import spmm, sddmm  # noqa: F401
from mini_tpu.ops.permute import (  # noqa: F401
    expand_to_edges,
    apply_fixed_perm,
    segmented_scan_reduce,
)
from mini_tpu.ops.engine import (  # noqa: F401
    src_vals_to_csc,
    dst_vals_to_csc,
    src_vals_to_csr,
    dst_vals_to_csr,
    reduce_csc_by_dst,
    reduce_csr_by_src,
)


def reduce_by_dst(g, vals, op="sum", mask=None):
    """Segmented reduce of CSC-ordered per-edge values into per-dst slots."""
    from mini_tpu.ops.segment import segment_reduce as _sr

    m = g.edge_mask_csc if mask is None else (mask & g.edge_mask_csc)
    return _sr(vals, g.csc_dsts, g.n_pad, op, mask=m)


def reduce_by_src(g, vals, op="sum", mask=None):
    """Segmented reduce of CSR-ordered per-edge values into per-src slots."""
    from mini_tpu.ops.segment import segment_reduce as _sr

    m = g.edge_mask if mask is None else (mask & g.edge_mask)
    return _sr(vals, g.csr_srcs, g.n_pad, op, mask=m)
