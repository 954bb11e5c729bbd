"""Native C++ loader parity: bitwise-identical CSR/CSC vs the NumPy path."""

import numpy as np
import pytest

from mini_tpu.graph import erdos_renyi, from_edges, save_mtx, load_mtx
from mini_tpu.native import (
    native_available,
    native_load_mtx,
    native_from_edges,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native lib unavailable"
)


def assert_hostgraph_equal(a, b):
    assert a.n == b.n and a.m == b.m
    np.testing.assert_array_equal(a.row_offsets, b.row_offsets)
    np.testing.assert_array_equal(a.csr_srcs, b.csr_srcs)
    np.testing.assert_array_equal(a.csr_dsts, b.csr_dsts)
    np.testing.assert_array_equal(a.csr_weights, b.csr_weights)
    np.testing.assert_array_equal(a.col_offsets, b.col_offsets)
    np.testing.assert_array_equal(a.csc_srcs, b.csc_srcs)
    np.testing.assert_array_equal(a.csc_dsts, b.csc_dsts)
    np.testing.assert_array_equal(a.csc_weights, b.csc_weights)
    np.testing.assert_array_equal(a.csc_eids, b.csc_eids)


def test_native_from_edges_parity():
    hg = erdos_renyi(100, 800, seed=5, weighted=True)
    # rebuild both ways from the same edge list
    srcs, dsts, w = hg.edge_list()
    py = from_edges(srcs, dsts, w, num_nodes=hg.n)
    nat = native_from_edges(srcs, dsts, w, num_nodes=hg.n)
    assert nat is not None
    assert_hostgraph_equal(py, nat)


def test_native_mtx_parity(tmp_path):
    hg = erdos_renyi(60, 400, seed=6, weighted=True)
    path = str(tmp_path / "g.mtx")
    save_mtx(hg, path, weights=True)
    py = load_mtx(path, use_native=False)
    nat = native_load_mtx(path)
    assert nat is not None
    assert_hostgraph_equal(py, nat)


def test_native_mtx_undirected_parity(tmp_path):
    hg = erdos_renyi(40, 200, seed=7)
    path = str(tmp_path / "u.mtx")
    save_mtx(hg, path, weights=False)
    py = load_mtx(path, use_native=False, undirected=True)
    nat = native_load_mtx(path, undirected=True)
    assert nat is not None
    assert_hostgraph_equal(py, nat)


def test_native_transpose_parity(tmp_path):
    hg = erdos_renyi(30, 150, seed=8, weighted=True)
    path = str(tmp_path / "t.mtx")
    save_mtx(hg, path, weights=True)
    py = load_mtx(path, use_native=False, transpose=True)
    nat = native_load_mtx(path, transpose=True)
    assert nat is not None
    assert_hostgraph_equal(py, nat)


def test_native_declines_random_weights(tmp_path):
    hg = erdos_renyi(10, 30, seed=9)
    path = str(tmp_path / "r.mtx")
    save_mtx(hg, path)
    assert native_load_mtx(path, random_weights=True) is None
