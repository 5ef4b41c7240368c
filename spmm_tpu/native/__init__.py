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
        lib.parse_coordinate.restype = ctypes.c_longlong
        lib.parse_coordinate.argtypes = [
            ctypes.c_char_p,
            ctypes.c_longlong,
            ctypes.c_longlong,  # num_lines
            ctypes.c_longlong,  # num_fields
            ctypes.POINTER(ctypes.c_int),  # rows out
            ctypes.POINTER(ctypes.c_int),  # cols out
            ctypes.POINTER(ctypes.c_double),  # vals out
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


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
