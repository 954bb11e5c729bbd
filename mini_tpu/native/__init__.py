"""ctypes bindings for the native C++ graph loader (``src/loader.cpp``).

Auto-builds ``libmini_graph.so`` with g++ on first use (cached); every entry
point degrades gracefully to the NumPy path if the toolchain or build is
unavailable.  Random-weight generation stays in NumPy (RandomState parity),
so ``native_load_mtx`` declines those requests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmini_graph.so")
_SRC = os.path.join(_DIR, "src", "loader.cpp")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            try:
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-std=c++17",
                        "-shared",
                        "-fPIC",
                        _SRC,
                        "-o",
                        _SO,
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.mg_load_mtx.restype = ctypes.c_int
        lib.mg_load_mtx.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            i64p,
        ]
        lib.mg_build.restype = ctypes.c_int
        lib.mg_build.argtypes = [
            ctypes.c_int64,
            ctypes.c_int64,
            i32p,
            i32p,
            f32p,
            i64p,
        ]
        lib.mg_fill.restype = ctypes.c_int
        lib.mg_fill.argtypes = [
            ctypes.c_int,
            i64p,
            i32p,
            i32p,
            f32p,
            i64p,
            i32p,
            i32p,
            f32p,
            i32p,
        ]
        lib.mg_free.argtypes = [ctypes.c_int]
        _lib = lib
        return _lib


def _extract(lib, handle: int, n: int, m: int, directed: bool):
    from mini_tpu.graph.csr import HostGraph

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)

    row_offsets = np.empty(n + 1, np.int64)
    csr_dsts = np.empty(m, np.int32)
    csr_srcs = np.empty(m, np.int32)
    csr_weights = np.empty(m, np.float32)
    col_offsets = np.empty(n + 1, np.int64)
    csc_srcs = np.empty(m, np.int32)
    csc_dsts = np.empty(m, np.int32)
    csc_weights = np.empty(m, np.float32)
    csc_eids = np.empty(m, np.int32)

    def p(a, t):
        return a.ctypes.data_as(t)

    ok = lib.mg_fill(
        handle,
        p(row_offsets, i64p),
        p(csr_dsts, i32p),
        p(csr_srcs, i32p),
        p(csr_weights, f32p),
        p(col_offsets, i64p),
        p(csc_srcs, i32p),
        p(csc_dsts, i32p),
        p(csc_weights, f32p),
        p(csc_eids, i32p),
    )
    lib.mg_free(handle)
    if not ok:
        return None
    return HostGraph(
        n=n,
        m=m,
        directed=directed,
        row_offsets=row_offsets,
        csr_dsts=csr_dsts,
        csr_srcs=csr_srcs,
        csr_weights=csr_weights,
        col_offsets=col_offsets,
        csc_srcs=csc_srcs,
        csc_dsts=csc_dsts,
        csc_weights=csc_weights,
        csc_eids=csc_eids,
    )


def native_available() -> bool:
    return _get_lib() is not None


def native_load_mtx(
    path: str,
    undirected: bool = False,
    random_weights: bool = False,
    seed: int = 0,
    transpose: bool = False,
):
    """Load an .mtx via the native parser; None if unavailable/declined."""
    if random_weights:
        return None  # RandomState parity requires the NumPy path
    lib = _get_lib()
    if lib is None:
        return None
    dims = np.zeros(2, np.int64)
    handle = lib.mg_load_mtx(
        path.encode(),
        int(undirected),
        int(transpose),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if handle <= 0:
        return None
    return _extract(
        lib, handle, int(dims[0]), int(dims[1]), directed=not undirected
    )


def native_from_edges(
    srcs: np.ndarray,
    dsts: np.ndarray,
    weights: Optional[np.ndarray],
    num_nodes: int,
    directed: bool = True,
):
    """Native CSR/CSC build from an edge list; None if unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    srcs = np.ascontiguousarray(srcs, np.int32)
    dsts = np.ascontiguousarray(dsts, np.int32)
    m = srcs.shape[0]
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    wp = (
        np.ascontiguousarray(weights, np.float32).ctypes.data_as(f32p)
        if weights is not None
        else None
    )
    dims = np.zeros(2, np.int64)
    handle = lib.mg_build(
        num_nodes,
        m,
        srcs.ctypes.data_as(i32p),
        dsts.ctypes.data_as(i32p),
        wp,
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if handle <= 0:
        return None
    return _extract(lib, handle, int(dims[0]), int(dims[1]), directed)
