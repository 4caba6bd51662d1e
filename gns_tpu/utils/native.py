"""ctypes bindings for the native data-loader (native/libgridpack.so).

The C++ packer performs the prepare_grid transform + bucket padding
(multithreaded across grids) and CSR edge sorting. The pure-numpy
implementation in prepare.py remains the reference; `pack_batch` produces
bit-identical output (tested in tests/test_native.py) and is used for large
datasets where Python-side packing dominates startup.

Build with `make -C native`; all entry points degrade gracefully to the
numpy path when the library is missing (`HAVE_NATIVE` is False).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libgridpack.so",
)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64, i32, f32, f64 = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_double),
    )
    lib.gridpack_prepare_batch.restype = ctypes.c_int
    lib.gridpack_prepare_batch.argtypes = [
        f64, i64, i64,  # bus_raw, bus_cols, max_nb
        f64, i64, i64,  # br_raw, br_cols, max_ne
        f64, i64, i64,  # gen_raw, gen_cols, max_ng
        ctypes.POINTER(ctypes.c_int64),  # dims
        f64,  # base_mva
        i64, ctypes.c_int,  # s, paper_shunts
        i64, i64, i64,  # pad_n, pad_e, pad_g
        f32, f32, f32,  # buses, lines, gens
        f32, f32, f32,  # masks
        i32,  # n_bus_out
        ctypes.c_int,  # n_threads
    ]
    lib.gridpack_csr_by_dst.restype = ctypes.c_int
    lib.gridpack_csr_by_dst.argtypes = [f32, i64, i64, i32, i32]
    _lib = lib
    return lib


HAVE_NATIVE = os.path.exists(_LIB_PATH)


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pack_batch(
    cases: List[dict],
    pad_sizes: Optional[Tuple[int, int, int]] = None,
    paper_shunts: bool = True,
    n_threads: Optional[int] = None,
):
    """Native equivalent of prepare.py's prepare_case + _stack_to_batch.

    Returns a GridBatch. Raises RuntimeError if the library is missing.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libgridpack.so not built; run `make -C native`")
    from gns_tpu.utils.prepare import GridBatch

    s = len(cases)
    dims = np.zeros((s, 3), np.int64)
    base = np.zeros((s,), np.float64)
    for i, c in enumerate(cases):
        dims[i] = (c["bus"].shape[0], c["branch"].shape[0], c["gen"].shape[0])
        base[i] = c["baseMVA"]
    max_nb, max_ne, max_ng = dims.max(axis=0)

    # Stage raw float64 tables into contiguous slabs.
    bus_cols = max(c["bus"].shape[1] for c in cases)
    br_cols = max(c["branch"].shape[1] for c in cases)
    gen_cols = max(c["gen"].shape[1] for c in cases)
    bus_raw = np.zeros((s, max_nb, bus_cols), np.float64)
    br_raw = np.zeros((s, max_ne, br_cols), np.float64)
    gen_raw = np.zeros((s, max_ng, gen_cols), np.float64)
    for i, c in enumerate(cases):
        nb, ne, ng = dims[i]
        bus_raw[i, :nb, : c["bus"].shape[1]] = c["bus"]
        br_raw[i, :ne, : c["branch"].shape[1]] = c["branch"]
        gen_raw[i, :ng, : c["gen"].shape[1]] = c["gen"]

    if pad_sizes is None:
        pad_n, pad_e, pad_g = int(max_nb), int(max_ne), int(max_ng)
    else:
        pad_n, pad_e, pad_g = pad_sizes
    pad_e = max(pad_e, pad_n)  # E >= N invariant

    buses = np.empty((s, pad_n, 6), np.float32)
    lines = np.empty((s, pad_e, 7), np.float32)
    gens = np.empty((s, pad_g, 7), np.float32)
    bus_mask = np.empty((s, pad_n), np.float32)
    line_mask = np.empty((s, pad_e), np.float32)
    gen_mask = np.empty((s, pad_g), np.float32)
    n_bus = np.empty((s,), np.int32)

    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)

    rc = lib.gridpack_prepare_batch(
        _ptr(bus_raw, ctypes.c_double), bus_cols, max_nb,
        _ptr(br_raw, ctypes.c_double), br_cols, max_ne,
        _ptr(gen_raw, ctypes.c_double), gen_cols, max_ng,
        _ptr(dims, ctypes.c_int64),
        _ptr(base, ctypes.c_double),
        s, int(paper_shunts),
        pad_n, pad_e, pad_g,
        _ptr(buses, ctypes.c_float), _ptr(lines, ctypes.c_float),
        _ptr(gens, ctypes.c_float),
        _ptr(bus_mask, ctypes.c_float), _ptr(line_mask, ctypes.c_float),
        _ptr(gen_mask, ctypes.c_float),
        _ptr(n_bus, ctypes.c_int32),
        n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"gridpack_prepare_batch failed with code {rc}")
    return GridBatch(buses, lines, gens, bus_mask, line_mask, gen_mask, n_bus)


def csr_by_dst(lines: np.ndarray, n_bus: int):
    """Edge permutation sorted by destination bus + CSR indptr.

    lines: one prepared (E, 7) float32 array. Returns (order (E,) int32,
    indptr (N+1,) int32). Numpy fallback when the library is missing.
    """
    lines = np.ascontiguousarray(lines, np.float32)
    e = lines.shape[0]
    lib = _load()
    if lib is None:
        dst = lines[:, 1].astype(np.int32) - 1
        order = np.argsort(dst, kind="stable").astype(np.int32)
        indptr = np.zeros(n_bus + 1, np.int32)
        np.add.at(indptr, dst + 1, 1)
        return order, np.cumsum(indptr, dtype=np.int32)
    order = np.empty((e,), np.int32)
    indptr = np.empty((n_bus + 1,), np.int32)
    rc = lib.gridpack_csr_by_dst(
        _ptr(lines, ctypes.c_float), e, n_bus,
        _ptr(order, ctypes.c_int32), _ptr(indptr, ctypes.c_int32),
    )
    if rc != 0:
        raise RuntimeError(f"gridpack_csr_by_dst failed with code {rc}")
    return order, indptr
