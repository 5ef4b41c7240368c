"""Native (C++) host components, loaded via ctypes.

The reference's runtime is entirely native C++ (SURVEY.md §2.11); the hot
host-side pieces here are likewise C++: the .mtx coordinate-body parser
(reference analog: serial_newblock_clock.cpp:47-124, iostream-bound there).
The shared library is built on demand by ``spmm_tpu/native/build.py`` from
``mtxparse.cpp``; everything degrades gracefully to numpy if the toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libspmm_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            from spmm_tpu.native.build import build

            build()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        LL, I32, F64 = ctypes.c_longlong, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double)
        PLL = ctypes.POINTER(ctypes.c_longlong)
        lib.parse_coordinate.restype = LL
        lib.parse_coordinate.argtypes = [ctypes.c_char_p, LL, LL, LL, I32, I32, F64]
        lib.region_split.restype = LL
        lib.region_split.argtypes = [PLL, I32, LL, LL, LL, I32, PLL]
        lib.region_split_permuted.restype = LL
        lib.region_split_permuted.argtypes = [PLL, I32, PLL, LL, LL, LL, I32, PLL]
        lib.relabel_first_touch.restype = LL
        lib.relabel_first_touch.argtypes = [I32, LL, PLL, LL, LL, I32, I32, I32, I32, PLL]
        lib.dominant_sections.restype = None
        lib.dominant_sections.argtypes = [PLL, I32, LL, LL, PLL]
        lib.pack_blocked.restype = LL
        lib.pack_blocked.argtypes = [
            PLL, I32, ctypes.c_char_p, LL, LL, LL,
            PLL, PLL, I32, PLL, LL, I32, I32,
            ctypes.c_char_p, I32, I32, PLL,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong))


def region_split(indptr: np.ndarray, cols: np.ndarray, ncol: int, budget: int):
    """Native first-touch region splitter; returns region row boundaries
    [0, r1, ..., nrow] or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    nrow = len(indptr) - 1
    stamp = np.empty(max(ncol, 1), dtype=np.int32)
    bounds = np.empty(nrow + 1, dtype=np.int64)
    nb = lib.region_split(_i64p(indptr), _i32p(cols), nrow, ncol, budget, _i32p(stamp), _i64p(bounds))
    return np.concatenate([[0], bounds[:nb]]).astype(np.int64)


def region_split_permuted(
    indptr: np.ndarray, cols: np.ndarray, row_perm: np.ndarray, ncol: int, budget: int
):
    """Native first-touch region splitter over rows visited in ``row_perm``
    order (no materialized reorder).  Returns [0, r1, ..., nrow] or None."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    row_perm = np.ascontiguousarray(row_perm, dtype=np.int64)
    nrow = len(indptr) - 1
    stamp = np.empty(max(ncol, 1), dtype=np.int32)
    bounds = np.empty(nrow + 1, dtype=np.int64)
    nb = lib.region_split_permuted(
        _i64p(indptr), _i32p(cols), _i64p(row_perm), nrow, ncol, budget, _i32p(stamp), _i64p(bounds)
    )
    return np.concatenate([[0], bounds[:nb]]).astype(np.int64)


def relabel_first_touch(cols: np.ndarray, region_nnz: np.ndarray, ncol: int):
    """Native per-region first-touch relabel.  Returns
    (codes, gather_cols, region_counts) or None."""
    lib = _load()
    if lib is None:
        return None
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    region_nnz = np.ascontiguousarray(region_nnz, dtype=np.int64)
    nnz = len(cols)
    nregions = len(region_nnz) - 1
    scratch_map = np.empty(max(ncol, 1), dtype=np.int32)
    scratch_stamp = np.empty(max(ncol, 1), dtype=np.int32)
    codes = np.empty(nnz, dtype=np.int32)
    gather = np.empty(max(nnz, 1), dtype=np.int32)
    counts = np.empty(max(nregions, 1), dtype=np.int64)
    total = lib.relabel_first_touch(
        _i32p(cols), nnz, _i64p(region_nnz), nregions, ncol,
        _i32p(scratch_map), _i32p(scratch_stamp), _i32p(codes), _i32p(gather), _i64p(counts),
    )
    return codes, gather[:total].copy(), counts[:nregions]


def pack_blocked(
    indptr_orig: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    row_perm: np.ndarray,
    indptr_final: np.ndarray,
    row_group: np.ndarray,
    region_bounds: np.ndarray,
    ncol: int,
):
    """Fused gather + v8 interleave + first-touch relabel.  Returns
    (packed_data, cols_local, gather_cols, region_counts) or None."""
    lib = _load()
    if lib is None:
        return None
    indptr_orig = np.ascontiguousarray(indptr_orig, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data)
    row_perm = np.ascontiguousarray(row_perm, dtype=np.int64)
    indptr_final = np.ascontiguousarray(indptr_final, dtype=np.int64)
    row_group = np.ascontiguousarray(row_group, dtype=np.int32)
    region_bounds = np.ascontiguousarray(region_bounds, dtype=np.int64)
    nrow = len(indptr_orig) - 1
    nregions = len(region_bounds) - 1
    nnz = int(indptr_final[-1])
    esz = data.dtype.itemsize
    scratch_map = np.empty(max(ncol, 1), dtype=np.int32)
    scratch_stamp = np.empty(max(ncol, 1), dtype=np.int32)
    packed = np.empty(nnz, dtype=data.dtype)
    cols_local = np.empty(nnz, dtype=np.int32)
    gather = np.empty(max(nnz, 1), dtype=np.int32)
    counts = np.empty(max(nregions, 1), dtype=np.int64)
    total = lib.pack_blocked(
        _i64p(indptr_orig),
        _i32p(indices),
        data.ctypes.data_as(ctypes.c_char_p),
        esz,
        nrow,
        ncol,
        _i64p(row_perm),
        _i64p(indptr_final),
        _i32p(row_group),
        _i64p(region_bounds),
        nregions,
        _i32p(scratch_map),
        _i32p(scratch_stamp),
        packed.ctypes.data_as(ctypes.c_char_p),
        _i32p(cols_local),
        _i32p(gather),
        _i64p(counts),
    )
    return packed, cols_local, gather[:total].copy(), counts[:nregions]


def dominant_sections(indptr: np.ndarray, cols: np.ndarray, section_size: int):
    """Native per-row dominant section (CSR with sorted columns) or None."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    nrow = len(indptr) - 1
    dom = np.empty(nrow, dtype=np.int64)
    lib.dominant_sections(_i64p(indptr), _i32p(cols), nrow, section_size, _i64p(dom))
    return dom


def available() -> bool:
    return _load() is not None


def parse_coordinate_body(body: bytes, num_fields: int, num_lines: int) -> Optional[np.ndarray]:
    """Parse ``num_lines`` whitespace-separated coordinate entries from
    ``body``.  Returns an (n, num_fields) float64 table (cols 0/1 are 1-based
    indices), or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows = np.empty(num_lines, dtype=np.int32)
    cols = np.empty(num_lines, dtype=np.int32)
    vals = np.empty(num_lines, dtype=np.float64)
    n = lib.parse_coordinate(
        body,
        len(body),
        num_lines,
        num_fields,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if n != num_lines:
        raise ValueError(f".mtx truncated: expected {num_lines} entries, parsed {n}")
    out = np.empty((num_lines, num_fields), dtype=np.float64)
    out[:, 0] = rows
    out[:, 1] = cols
    if num_fields >= 3:
        out[:, 2] = vals
    if num_fields >= 4:
        out[:, 3] = 0.0
    return out
