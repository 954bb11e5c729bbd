"""Sparse (compact-frontier) advance: bounded-shape frontier expansion.

The dense engine sweeps all m edges per iteration — right for large
frontiers, wasteful for tiny ones (high-diameter graphs pay diameter x m).
This is the TPU re-expression of the reference's load-balanced sparse
advance (`/root/reference/gunrock/src/advance.hxx:21-67`): the degree scan +
``transform_lbs`` merge-path search becomes an exclusive cumsum + a
vectorized ``searchsorted`` over a *static-capacity* edge slot array, so the
whole expansion stays jit-compatible.  Work is O(capacity), not O(m):
per-element XLA gathers are affordable here because the frontier is small by
construction (the direction switch guarantees fit before selecting this
path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mini_tpu.graph.csr import GraphSlice
from mini_tpu.ops.segment import exclusive_cumsum


def default_tiers(
    g: GraphSlice,
    max_capv: int | None = None,
    max_cape: int | None = None,
) -> list[tuple[int, int]]:
    """Ascending (capv, cape) capacity tiers for the sparse path.

    Static shapes mean a sparse step costs O(capacity) regardless of the
    actual frontier, so several tiers let tiny frontiers (high-diameter
    graphs) pay tiny sweeps while mid-size frontiers still beat the dense
    O(m) sweep.  Tiers top out around m/16 — beyond that the dense engine
    wins (a cape-sized sparse step costs ~10x more per element than the
    dense sweep's vectorized path).
    """
    if max_cape is None:
        max_cape = max(2048, g.m_pad // 64)
    if max_capv is None:
        max_capv = min(g.n_pad, max_cape)
    # ONE sparse tier: every extra lax.switch branch is a separately
    # compiled loop body, and compile time through the remote toolchain
    # dwarfs the runtime difference between tier sizes (measured: 1 extra
    # tier ~= +60 s compile; tier-size runtime delta ~= 0.5 ms/iter)
    cape = min(max_cape, g.m_pad)
    return [(min(max_capv, cape, g.n_pad), cape)]


def frontier_edge_count(g: GraphSlice, mask: jnp.ndarray) -> jnp.ndarray:
    """Total out-edges of frontier vertices (the reference's degree-scan
    total, kept on device)."""
    return jnp.sum(jnp.where(mask, g.out_degrees, 0), dtype=jnp.int32)


def compact_frontier(mask: jnp.ndarray, capv: int):
    """Bounded compaction of a bitmap (see ops/frontier.compact_mask, but
    zero-filling instead of -1 holes so downstream gathers stay
    in-bounds).  Returns (indices int32[capv] ascending, count,
    overflowed).  ``overflowed`` is True when the population exceeded
    ``capv`` and entries were dropped; the algorithms' tier selection
    checks capacity-fit BEFORE routing here (``frontier_edge_count``), so
    on those paths the flag is statically False — direct callers must
    check it (the reference hard-exits instead, `frontier.hxx:85-93`).

    Mechanism (round 5): ``lax.top_k`` over position-coded mask values —
    the k largest values ARE the k smallest set positions.  Replaces the
    cumsum + n-sized scatter, which at ~10 ns/update was THE per-round
    floor of every high-diameter traversal (measured 5.19 ms vs top_k's
    1.01 ms at n=524k, `scratch/probe_compact.py`)."""
    n = mask.shape[0]
    count = jnp.sum(mask.astype(jnp.int32))
    vals = jnp.where(
        mask, jnp.int32(n) - jnp.arange(n, dtype=jnp.int32), jnp.int32(0)
    )
    top, _ = jax.lax.top_k(vals, capv)
    idx = jnp.where(top > 0, jnp.int32(n) - top, 0)
    return idx, jnp.minimum(count, capv), count > capv


def expand_frontier(
    g: GraphSlice,
    indices: jnp.ndarray,  # int32[capv]
    count: jnp.ndarray,  # int32
    cape: int,
):
    """Expand the compact frontier into up to ``cape`` edge slots.

    Returns (src, dst, eid, valid) arrays of shape [cape].  Edge slots past
    the total work count are invalid.  Caller must guarantee
    ``frontier_edge_count <= cape`` (the direction switch does).
    """
    capv = indices.shape[0]
    in_range = jnp.arange(capv) < count
    idx = jnp.where(in_range, indices, 0)
    degs = jnp.where(in_range, g.out_degrees[idx], 0)
    pos = exclusive_cumsum(degs)  # [capv]
    total = pos[-1] + degs[-1]

    # merge-path assignment without searchsorted (whose binary search costs
    # log(capv) cape-sized gathers): scatter a +1 at each vertex's start
    # offset and prefix-sum — vslot[s] = (# starts <= s) - 1.  Zero-degree
    # frontier vertices stack at the same bin; the later vertex wins, which
    # matches searchsorted(side='right')-1.
    starts = jnp.where(in_range, jnp.clip(pos, 0, cape), cape)
    hist = jnp.zeros(cape + 1, jnp.int32).at[starts].add(1, mode="drop")
    vslot = jnp.cumsum(hist[:cape]) - 1
    vslot = jnp.clip(vslot, 0, capv - 1)

    slots = jnp.arange(cape, dtype=jnp.int32)
    valid = slots < total
    src = indices[vslot]
    rank = slots - pos[vslot]
    eid = g.row_offsets[src] + rank
    eid = jnp.clip(eid, 0, g.m_pad - 1)
    dst = g.csr_dsts[eid]
    valid = valid & (rank < g.out_degrees[src]) & (rank >= 0)
    return src, dst, eid, valid, total
