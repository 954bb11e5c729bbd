"""L-Spar local-similarity graph sparsification (one-shot pipeline).

Reference recipe (`/root/reference/gunrock/src/lspar/lspar_enactor.hxx:49-111`):
(1) neighborhood min-reduce of universal-hash vertex hashes -> per-vertex
minwise hash; (2) advance writes per-edge sim = (minhash[src]==minhash[dst]);
(3) moderngpu ``segmented_sort`` orders each vertex's adjacency by sim
descending; (4) advance tags the top-⌊deg^e⌋ edges per vertex;
(5) ``transform_compact`` gathers the selected edges.

TPU re-design: the per-vertex segmented sort becomes ONE global stable sort
keyed by (src, -sim) — segments stay contiguous, so the within-segment rank
is just ``position - row_offset`` — and the tag+compact steps become a mask.
The universal hash family ``(b + a*i) mod p`` and the host-side primality
check match the reference (`lspar/lspar_problem.hxx:58-93`).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mini_tpu.graph.csr import GraphSlice, HostGraph
from mini_tpu.ops.segment import segment_reduce


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LsparResult:
    selected_mask: jnp.ndarray  # bool[m_pad] over CSR edge ids
    sims: jnp.ndarray  # int32[m_pad]: per-edge minhash similarity (CSR order)
    num_selected: jnp.ndarray  # int32


def is_prime(number: int) -> bool:
    """Host-side primality test (reference `lspar/lspar_problem.hxx:80-89`)."""
    if number < 2:
        return False
    if number in (2, 3):
        return True
    if number % 2 == 0 or number % 3 == 0:
        return False
    k = 1
    while 36 * k * k - 12 * k < number:
        if number % (6 * k + 1) == 0 or number % (6 * k - 1) == 0:
            return False
        k += 1
    return True


@jax.jit
def _lspar_impl(g: GraphSlice, hashs, thresholds):
    n_pad, m_pad = g.n_pad, g.m_pad
    esrc, edst, emask = g.csr_srcs, g.csr_dsts, g.edge_mask

    # (1) minwise hash over out-neighbors
    minwise = segment_reduce(
        hashs[edst], esrc, n_pad, "min", mask=emask
    )
    # (2) per-edge similarity
    sims = jnp.where(
        emask & (minwise[esrc] == minwise[edst]), 1, 0
    ).astype(jnp.int32)
    # (3) stable global sort by (src, sim desc) — segments stay contiguous.
    # int32 key: src*2 + (1-sim) needs n_pad < 2^30 (graphs beyond that
    # exceed single-chip HBM anyway).
    key = esrc * 2 + (1 - sims)
    order = jnp.argsort(key, stable=True)
    src_sorted = esrc[order]
    # (4) within-segment rank + threshold tag
    rank = jnp.arange(m_pad, dtype=jnp.int32) - g.row_offsets[src_sorted]
    sel_sorted = (rank < thresholds[src_sorted]) & emask[order]
    # (5) map the selection back to CSR edge ids (compact step)
    selected = jnp.zeros(m_pad, jnp.bool_).at[order].set(sel_sorted)
    return LsparResult(
        selected_mask=selected,
        sims=sims,
        num_selected=jnp.sum(sel_sorted.astype(jnp.int32)),
    )


def lspar(
    g: GraphSlice,
    prime: int = 999983,
    e: float = 0.5,
    seed: int = 0,
) -> LsparResult:
    if not is_prime(prime):
        raise ValueError(f"{prime} is not prime")
    rng = np.random.RandomState(seed)
    a = rng.randint(1, prime)  # params as in `lspar/lspar_problem.hxx:95-99`
    b = rng.randint(0, prime)
    idx = np.arange(g.n_pad, dtype=np.int64)
    hashs = jnp.asarray(((b + a * idx) % prime).astype(np.int32))
    deg = np.asarray(g.out_degrees).astype(np.float64)
    thresholds = jnp.asarray(
        np.floor(np.power(deg, e)).astype(np.int32)
    )  # ⌊deg^e⌋, `lspar/lspar_problem.hxx:58-63`
    return _lspar_impl(g, hashs, thresholds)


def lspar_cpu(
    hg: HostGraph, hashs: np.ndarray, e: float
) -> tuple[np.ndarray, int]:
    """NumPy oracle (the reference ships none — `tests/lspar/test_lspar.cu:37-39`
    prints the count only).  Returns (selected bool[m] over CSR edges, count).
    """
    minwise = np.full(hg.n, np.iinfo(np.int32).max, dtype=np.int64)
    np.minimum.at(minwise, hg.csr_srcs, hashs[hg.csr_dsts])
    sims = (minwise[hg.csr_srcs] == minwise[hg.csr_dsts]).astype(np.int32)
    thres = np.floor(np.power(hg.out_degrees.astype(np.float64), e)).astype(
        np.int64
    )
    selected = np.zeros(hg.m, dtype=bool)
    for v in range(hg.n):
        lo, hi = hg.row_offsets[v], hg.row_offsets[v + 1]
        seg = np.arange(lo, hi)
        order = seg[np.argsort(-sims[lo:hi], kind="stable")]
        selected[order[: thres[v]]] = True
    return selected, int(selected.sum())
