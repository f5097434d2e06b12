"""ctypes bindings + on-demand build of the native C++ graph loader.

The shared library is compiled from ``native/graph_loader.cpp`` with the
system toolchain on first use and cached next to the source (keyed by a
source hash). Everything degrades gracefully: if no compiler is available
the callers fall back to the pure-Python ingest path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

__all__ = ["native_available", "load_edgelist_native",
           "csr_from_edges_native"]

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "graph_loader.cpp")


def _build_lib():
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(os.path.dirname(_SRC),
                       f"libgraph_loader.{digest}.so")
    if not os.path.exists(out):
        # build to a temp name and rename atomically so a concurrent
        # process can never dlopen a half-written library
        tmp = f"{out}.tmp.{os.getpid()}"
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
               "-o", tmp]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, out)
    return out


def _get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            path = _build_lib()
            lib = ctypes.CDLL(path)
            lib.gl_load.restype = ctypes.c_void_p
            lib.gl_load.argtypes = [ctypes.c_char_p]
            lib.gl_error.restype = ctypes.c_char_p
            lib.gl_error.argtypes = [ctypes.c_void_p]
            lib.gl_num_nodes.restype = ctypes.c_int32
            lib.gl_num_nodes.argtypes = [ctypes.c_void_p]
            lib.gl_num_edges.restype = ctypes.c_int64
            lib.gl_num_edges.argtypes = [ctypes.c_void_p]
            lib.gl_max_deg.restype = ctypes.c_int32
            lib.gl_max_deg.argtypes = [ctypes.c_void_p]
            lib.gl_fill.restype = None
            lib.gl_fill.argtypes = [ctypes.c_void_p] + [
                np.ctypeslib.ndpointer(dtype=dt, flags="C_CONTIGUOUS")
                for dt in (np.uint8, np.int32, np.int32, np.int64)
            ]
            lib.gl_free.restype = None
            lib.gl_free.argtypes = [ctypes.c_void_p]
            lib.gl_csr_from_edges.restype = ctypes.c_void_p
            lib.gl_csr_from_edges.argtypes = [
                np.ctypeslib.ndpointer(dtype=np.int64,
                                       flags="C_CONTIGUOUS"),
                ctypes.c_int64]
            lib.gl_csr_error.restype = ctypes.c_char_p
            lib.gl_csr_error.argtypes = [ctypes.c_void_p]
            lib.gl_csr_num_nodes.restype = ctypes.c_int64
            lib.gl_csr_num_nodes.argtypes = [ctypes.c_void_p]
            lib.gl_csr_nnz.restype = ctypes.c_int64
            lib.gl_csr_nnz.argtypes = [ctypes.c_void_p]
            lib.gl_csr_max_deg.restype = ctypes.c_int32
            lib.gl_csr_max_deg.argtypes = [ctypes.c_void_p]
            lib.gl_csr_fill.restype = None
            lib.gl_csr_fill.argtypes = [ctypes.c_void_p] + [
                np.ctypeslib.ndpointer(dtype=dt, flags="C_CONTIGUOUS")
                for dt in (np.int32, np.int32, np.int32, np.int64)
            ]
            lib.gl_csr_free.restype = None
            lib.gl_csr_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def load_edgelist_native(path: str):
    """Parse an edge list with the C++ loader. Returns
    ``(adj_bool, nbr, deg, node_ids)`` NumPy arrays, or raises
    ``RuntimeError`` if the native loader is unavailable or parsing
    failed."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native graph loader unavailable")
    h = lib.gl_load(path.encode())
    try:
        err = lib.gl_error(h)
        if err:
            raise RuntimeError(f"graph_loader: {err.decode()}")
        n = lib.gl_num_nodes(h)
        md = lib.gl_max_deg(h)
        adj = np.zeros((n, n), np.uint8)
        nbr = np.zeros((n, md), np.int32)
        deg = np.zeros((n,), np.int32)
        node_ids = np.zeros((n,), np.int64)
        lib.gl_fill(h, adj, nbr, deg, node_ids)
        return adj.astype(bool), nbr, deg, node_ids
    finally:
        lib.gl_free(h)


def csr_from_edges_native(edges: np.ndarray):
    """Intern + dedup + sorted-CSR build of an (E, 2) int64 edge array
    with the C++ builder (``native/graph_loader.cpp::gl_csr_from_edges``)
    — identical arrays to the NumPy packed-key path in
    ``data/graphs.py`` (tested), ~3x faster at the 9.4M-node flagship
    on this 1-core host. Returns
    ``(nbr_flat, offsets, deg, node_ids, max_deg)``; raises
    ``RuntimeError`` when the native library is unavailable."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native graph loader unavailable")
    edges = np.ascontiguousarray(edges, np.int64)
    if edges.ndim != 2 or (edges.size and edges.shape[1] != 2):
        raise ValueError(f"edge list must be (E, 2), got {edges.shape}")
    h = lib.gl_csr_from_edges(edges.reshape(-1), edges.shape[0])
    try:
        err = lib.gl_csr_error(h)
        if err:
            raise RuntimeError(f"graph_loader csr: {err.decode()}")
        n = lib.gl_csr_num_nodes(h)
        nnz = lib.gl_csr_nnz(h)
        nbr_flat = np.zeros((nnz,), np.int32)
        offsets = np.zeros((n,), np.int32)
        deg = np.zeros((n,), np.int32)
        node_ids = np.zeros((n,), np.int64)
        lib.gl_csr_fill(h, nbr_flat, offsets, deg, node_ids)
        return nbr_flat, offsets, deg, node_ids, int(lib.gl_csr_max_deg(h))
    finally:
        lib.gl_csr_free(h)
