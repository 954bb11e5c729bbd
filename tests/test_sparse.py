"""Sparse (compact-frontier) advance path tests: expansion against the
dense oracle, and direction-switch consistency (sparse vs dense BFS results
must be identical)."""

import numpy as np
import jax.numpy as jnp

from mini_tpu.graph import erdos_renyi, from_edges, GraphSlice
from mini_tpu.ops.sparse import (
    compact_frontier,
    expand_frontier,
    frontier_edge_count,
)
from mini_tpu.algorithms import bfs, bfs_cpu


def test_compact_frontier():
    mask = jnp.array([False, True, False, True, True, False])
    idx, count, overflow = compact_frontier(mask, 4)
    assert int(count) == 3
    assert not bool(overflow)
    np.testing.assert_array_equal(np.asarray(idx)[:3], [1, 3, 4])


def test_compact_frontier_overflow_detected():
    mask = jnp.ones(10, jnp.bool_)
    idx, count, overflow = compact_frontier(mask, 4)
    assert int(count) == 4
    assert bool(overflow)  # dropped work must be signalled, not silent


def test_expand_frontier_matches_adjacency(random_graph, random_slice):
    gs = random_slice
    rng = np.random.RandomState(0)
    mask_np = np.zeros(gs.n_pad, bool)
    chosen = rng.choice(random_graph.n, 13, replace=False)
    mask_np[chosen] = True
    mask = jnp.asarray(mask_np)
    capv, cape = 64, 1024
    assert int(frontier_edge_count(gs, mask)) <= cape
    idx, cnt, _ = compact_frontier(mask, capv)
    src, dst, eid, valid, total = expand_frontier(gs, idx, cnt, cape)
    v = np.asarray(valid)
    got = sorted(zip(np.asarray(src)[v].tolist(), np.asarray(dst)[v].tolist()))
    expect = []
    for u in sorted(chosen):
        lo, hi = random_graph.row_offsets[u], random_graph.row_offsets[u + 1]
        for e in range(lo, hi):
            expect.append((int(u), int(random_graph.csr_dsts[e])))
    assert got == sorted(expect)
    assert int(total) == len(expect)


def test_bfs_sparse_equals_dense(random_graph, random_slice):
    dense = bfs(random_slice, 3, sparse_cape=1, sparse_capv=1)  # force dense
    mixed = bfs(random_slice, 3)  # capacity defaults enable sparse
    np.testing.assert_array_equal(
        np.asarray(dense.labels), np.asarray(mixed.labels)
    )
    expected = bfs_cpu(random_graph, 3)
    np.testing.assert_array_equal(
        np.asarray(mixed.labels)[: random_graph.n], expected
    )


def test_bfs_high_diameter_path_graph_uses_sparse():
    # a 2000-vertex path: diameter 1999, frontier always size 1
    n = 2000
    srcs = np.arange(n - 1)
    dsts = np.arange(1, n)
    hg = from_edges(srcs, dsts, num_nodes=n, make_undirected=True)
    gs = GraphSlice.from_host(hg)
    res = bfs(gs, 0)
    expected = bfs_cpu(hg, 0)
    np.testing.assert_array_equal(np.asarray(res.labels)[:n], expected)
    assert int(res.num_sparse_iterations) > 1900  # nearly all sparse
