"""Graph loading / CSR-CSC construction tests (oracle: NumPy dense matrix)."""

import numpy as np
import pytest

from mini_tpu.graph import (
    HostGraph,
    GraphSlice,
    from_edges,
    load_mtx,
    save_mtx,
    erdos_renyi,
    rmat,
)


def dense_adj(hg: HostGraph) -> np.ndarray:
    a = np.zeros((hg.n, hg.n), dtype=np.float64)
    np.add.at(a, (hg.csr_srcs, hg.csr_dsts), hg.csr_weights)
    return a


def test_from_edges_csr_csc_agree():
    hg = erdos_renyi(50, 300, seed=0, weighted=True)
    a_csr = dense_adj(hg)
    a_csc = np.zeros_like(a_csr)
    np.add.at(a_csc, (hg.csc_srcs, hg.csc_dsts), hg.csc_weights)
    np.testing.assert_array_equal(a_csr, a_csc)
    # offsets are consistent with sorted segment ids
    assert np.all(np.diff(hg.csr_srcs) >= 0)
    assert np.all(np.diff(hg.csc_dsts) >= 0)
    np.testing.assert_array_equal(
        np.diff(hg.row_offsets), np.bincount(hg.csr_srcs, minlength=hg.n)
    )
    np.testing.assert_array_equal(
        np.diff(hg.col_offsets), np.bincount(hg.csc_dsts, minlength=hg.n)
    )


def test_csc_eids_roundtrip():
    hg = erdos_renyi(40, 250, seed=1, weighted=True)
    # csc arrays must be the csr arrays permuted by csc_eids
    np.testing.assert_array_equal(hg.csr_srcs[hg.csc_eids], hg.csc_srcs)
    np.testing.assert_array_equal(hg.csr_dsts[hg.csc_eids], hg.csc_dsts)
    np.testing.assert_array_equal(hg.csr_weights[hg.csc_eids], hg.csc_weights)


def test_directed_csc_is_real_transpose():
    """The reference discards its directed CSC (graph.hxx:215-216); ours must
    be the actual transpose."""
    hg = from_edges([0, 0, 2], [1, 2, 1], num_nodes=3)
    assert hg.directed
    np.testing.assert_array_equal(np.diff(hg.col_offsets), [0, 2, 1])
    np.testing.assert_array_equal(hg.csc_srcs, [0, 2, 0])
    np.testing.assert_array_equal(hg.csc_dsts, [1, 1, 2])


def test_undirected_doubling():
    hg = from_edges([0], [1], num_nodes=2, make_undirected=True)
    assert hg.m == 2
    assert not hg.directed
    a = dense_adj(hg)
    np.testing.assert_array_equal(a, a.T)


def test_mtx_roundtrip(tmp_path, tiny_graph):
    path = str(tmp_path / "g.mtx")
    save_mtx(tiny_graph, path, weights=True)
    hg2 = load_mtx(path)
    np.testing.assert_array_equal(dense_adj(tiny_graph), dense_adj(hg2))


def test_mtx_comments_and_weightless(tmp_path):
    path = str(tmp_path / "c.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket\n% comment\n3 3 2\n1 2\n3 1\n")
    hg = load_mtx(path)
    assert hg.n == 3 and hg.m == 2
    np.testing.assert_array_equal(hg.csr_srcs, [0, 2])
    np.testing.assert_array_equal(hg.csr_dsts, [1, 0])
    np.testing.assert_array_equal(hg.csr_weights, [1.0, 1.0])
    # transpose=True reproduces the reference's column-2-keyed CSR
    hg_t = load_mtx(path, transpose=True)
    np.testing.assert_array_equal(hg_t.csr_srcs, [0, 1])
    np.testing.assert_array_equal(hg_t.csr_dsts, [2, 0])


def test_graph_slice_padding(random_graph):
    gs = GraphSlice.from_host(random_graph)
    assert gs.n_pad % 128 == 0 and gs.m_pad % 1024 == 0
    assert gs.n_pad > random_graph.n  # ghost vertex exists
    ro = np.asarray(gs.row_offsets)
    assert ro.shape == (gs.n_pad + 1,)
    assert ro[-1] == gs.m_pad
    em = np.asarray(gs.edge_mask)
    assert em.sum() == random_graph.m
    # ghost edges attach to the last ghost vertex
    srcs = np.asarray(gs.csr_srcs)
    assert np.all(srcs[random_graph.m:] == gs.n_pad - 1)
    deg = np.asarray(gs.out_degrees)
    np.testing.assert_array_equal(deg[: gs.n], random_graph.out_degrees)
    assert np.all(deg[gs.n:] == 0)


def test_graph_slice_is_pytree(tiny_slice):
    import jax

    leaves = jax.tree_util.tree_leaves(tiny_slice)
    assert len(leaves) == len(GraphSlice._DATA_FIELDS)

    @jax.jit
    def f(g):
        return g.out_degrees.sum()

    assert int(f(tiny_slice)) == tiny_slice.m


def test_ranks(tiny_slice):
    ranks = np.asarray(tiny_slice.csr_ranks())
    ro = np.asarray(tiny_slice.row_offsets)
    srcs = np.asarray(tiny_slice.csr_srcs)
    for e in range(tiny_slice.m):
        assert ranks[e] == e - ro[srcs[e]]


def test_rmat_shapes():
    hg = rmat(8, edge_factor=4, seed=0)
    assert hg.n == 256
    assert hg.m == 2 * 256 * 4  # undirected doubling
    assert hg.csr_srcs.max() < hg.n
