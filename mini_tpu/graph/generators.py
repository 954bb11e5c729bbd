"""Deterministic synthetic graph generators (NumPy, host-side).

The reference ships only tiny hand-written .mtx fixtures
(`/root/reference/gunrock/tests/*/test*.mtx`) and points its run scripts at
external datasets.  For benchmarking and property tests we generate graphs:
Erdos-Renyi for uniform-degree sanity and RMAT (Graph500-style) for the
power-law degree distributions that stress load balancing.
"""

from __future__ import annotations

import numpy as np

from mini_tpu.graph.csr import HostGraph, from_edges


def erdos_renyi(
    n: int,
    m: int,
    seed: int = 0,
    undirected: bool = False,
    weighted: bool = False,
    max_weight: int = 64,
) -> HostGraph:
    """G(n, m): m edges sampled uniformly (with replacement, no self-loops)."""
    rng = np.random.RandomState(seed)
    srcs = rng.randint(0, n, size=m).astype(np.int64)
    dsts = rng.randint(0, n, size=m).astype(np.int64)
    loop = srcs == dsts
    dsts[loop] = (dsts[loop] + 1) % n
    weights = (
        rng.randint(1, max_weight, size=m).astype(np.float32)
        if weighted
        else None
    )
    return from_edges(
        srcs, dsts, weights, num_nodes=n, make_undirected=undirected
    )


def rmat(
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 0,
    undirected: bool = True,
    weighted: bool = False,
    max_weight: int = 64,
) -> HostGraph:
    """RMAT generator: n = 2**scale vertices, n * edge_factor edges.

    Vectorized recursive quadrant sampling (Graph500 Kronecker style).
    """
    rng = np.random.RandomState(seed)
    n = 1 << scale
    m = n * edge_factor
    srcs = np.zeros(m, dtype=np.int64)
    dsts = np.zeros(m, dtype=np.int64)
    ab = a + b
    a_norm = a / ab
    c_norm = c / (1.0 - ab)
    for bit in range(scale):
        r1 = rng.random_sample(m)
        r2 = rng.random_sample(m)
        src_bit = (r1 > ab).astype(np.int64)
        dst_bit = np.where(
            src_bit == 0, r2 > a_norm, r2 > c_norm
        ).astype(np.int64)
        srcs |= src_bit << bit
        dsts |= dst_bit << bit
    # permute vertex ids to break the generator's degree/id correlation
    perm = rng.permutation(n)
    srcs, dsts = perm[srcs], perm[dsts]
    loop = srcs == dsts
    dsts[loop] = (dsts[loop] + 1) % n
    weights = (
        rng.randint(1, max_weight, size=m).astype(np.float32)
        if weighted
        else None
    )
    return from_edges(
        srcs, dsts, weights, num_nodes=n, make_undirected=undirected
    )
