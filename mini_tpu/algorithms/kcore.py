"""k-core decomposition by iterative peeling.

Reference recipe (`/root/reference/gunrock/src/kcore/kcore_enactor.hxx:41-84`):
for k = 1..n, repeatedly filter out vertices with ``0 < degree < k``
(recording core number k-1 and zeroing their degree), then advance over the
removed set decrementing each out-neighbor's degree with atomicAdd
(`kcore/kcore_functor.hxx:31-35`); when no vertex with degree >= k survives,
the largest k-core is k-1.

TPU re-design: degrees/cores are dense arrays; the degree decrement is a
segment-sum of removed-source edge counts (deterministic, replacing
atomicAdd); both the peel loop and the outer k loop are on-device
``lax.while_loop``s — zero host round-trips.  Degrees carry over between k
values exactly as the reference's persistent ``d_degrees`` does.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mini_tpu.graph.csr import GraphSlice, HostGraph
from mini_tpu.ops.engine import reduce_csc_by_dst
from mini_tpu.ops.permute import expand_to_edges, apply_fixed_perm_bit
from mini_tpu.ops.sparse import (
    compact_frontier,
    expand_frontier,
    frontier_edge_count,
    default_tiers,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KCoreResult:
    num_cores: jnp.ndarray  # int32[n_pad]: core number per vertex
    largest_k_core: jnp.ndarray  # int32
    num_iterations: jnp.ndarray


@functools.partial(jax.jit, static_argnums=(1,))
def _kcore_impl(g: GraphSlice, max_k: int):
    n_pad = g.n_pad

    deg0 = g.out_degrees.astype(jnp.int32)
    cores0 = jnp.zeros(n_pad, jnp.int32)
    rank2 = g.csr_to_csc_rank * 2
    tiers = default_tiers(g)

    def dense_dec(ops):
        """Per-dst count of in-edges from peeled sources (gather-free
        sweep; the peel bit rides inside the sort key)."""
        (peel,) = ops
        peel_csr = expand_to_edges(
            peel.astype(jnp.int32), g.row_offsets, g.m_pad
        )
        peel_csc = apply_fixed_perm_bit(rank2, peel_csr)
        return reduce_csc_by_dst(g, peel_csc, "sum")

    def make_sparse_dec(capv, cape):
        def sparse_dec(ops):
            """Bounded expansion of the (usually small) peel set —
            decrement via a capacity-sized scatter-add.  NOTE: expansion
            uses the ORIGINAL degrees, so edges into already-removed
            vertices still decrement (their degree goes negative exactly
            as in the reference's atomicAdd, `kcore/kcore_functor.hxx:34`
            — identical to the dense sweep's edge set)."""
            (peel,) = ops
            idx, cnt = compact_frontier(peel, capv)
            _, dst, _, valid, _ = expand_frontier(g, idx, cnt, cape)
            dec_ext = jnp.zeros(n_pad + 1, jnp.int32)
            dec_ext = dec_ext.at[jnp.where(valid, dst, n_pad)].add(
                1, mode="drop"
            )
            return dec_ext[:n_pad]

        return sparse_dec

    branches = [make_sparse_dec(cv, ce) for cv, ce in tiers] + [dense_dec]

    def peel_round(state):
        deg, cores, k, iters = state
        peel = (deg < k) & (deg > 0)
        cores = jnp.where(peel, k - 1, cores)
        fe = frontier_edge_count(g, peel)
        fl = jnp.sum(peel, dtype=jnp.int32)
        tier_idx = jnp.int32(len(tiers))
        for i in reversed(range(len(tiers))):
            cv, ce = tiers[i]
            tier_idx = jnp.where(
                (fe <= ce) & (fl <= cv), jnp.int32(i), tier_idx
            )
        dec = jax.lax.switch(tier_idx, branches, (peel,))
        deg = jnp.where(peel, 0, deg - dec)
        return deg, cores, k, iters + 1

    def peel_cond(state):
        deg, _, k, _ = state
        return jnp.any((deg < k) & (deg > 0))

    INT_MAX = jnp.iinfo(jnp.int32).max

    def outer_body(state):
        deg, cores, k, largest, iters = state
        deg, cores, _, iters = jax.lax.while_loop(
            peel_cond, peel_round, (deg, cores, k, iters)
        )
        survivors = jnp.sum((deg >= k).astype(jnp.int32))
        done = survivors == 0
        largest = jnp.where(done, k - 1, largest)
        # level jumping: k values in (k, min surviving degree] peel nothing
        # (a vertex with degree d first peels at k = d+1), so hop straight
        # there — identical cores, outer trips drop from max_degree to the
        # number of distinct occupied degree levels
        min_deg = jnp.min(jnp.where(deg > 0, deg, INT_MAX))
        next_k = jnp.maximum(k + 1, jnp.where(done, k + 1, min_deg + 1))
        return deg, cores, next_k, largest, iters

    def outer_cond(state):
        _, _, k, largest, _ = state
        return (largest < 0) & (k <= max_k)

    _, cores, _, largest, iters = jax.lax.while_loop(
        outer_cond,
        outer_body,
        (deg0, cores0, jnp.int32(1), jnp.int32(-1), jnp.int32(0)),
    )
    return KCoreResult(cores, largest, iters)


def kcore(g: GraphSlice) -> KCoreResult:
    # k never needs to exceed max degree + 1
    max_k = int(np.asarray(g.out_degrees).max()) + 1
    return _kcore_impl(g, max_k)


def kcore_cpu(hg: HostGraph) -> tuple[np.ndarray, int]:
    """NumPy oracle mirroring the reference CPU peeling
    (`kcore/kcore_problem.hxx:54-105`) — except the k loop runs to
    max_degree+1 rather than the reference's num_nodes cap
    (`kcore/kcore_enactor.hxx:45`), which silently under-peels multigraphs
    whose core numbers exceed n."""
    deg = hg.out_degrees.astype(np.int64).copy()
    cores = np.zeros(hg.n, dtype=np.int32)
    largest = -1
    for k in range(1, int(max(deg.max(initial=0), 0)) + 2):
        while True:
            peel = (deg < k) & (deg > 0)
            if not peel.any():
                break
            cores[peel] = k - 1
            dec = np.zeros(hg.n, dtype=np.int64)
            active = peel[hg.csr_srcs]
            np.add.at(dec, hg.csr_dsts[active], 1)
            deg = np.where(peel, 0, deg - dec)
        if (deg >= k).sum() == 0:
            largest = k - 1
            break
    return cores, largest
