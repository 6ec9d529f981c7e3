"""ctypes bridge to the native columnar table parser.

The reference gets its dump/XYZ parse speed from Polars' multithreaded Rust
CSV reader (reference load_save.py:42-64); here the equivalent is
``native/table_parser.cpp`` — OpenMP + std::from_chars parsing whole file
bodies into preallocated column matrices without materializing per-line
Python strings. Any malformed body makes the native call return -1 and the
caller falls back to the general pandas-based parser.
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional

import numpy as np

# Column names whose tokens are strings, not numbers (fixed-width parsed).
STR_COLS = frozenset({"element", "species", "name", "label", "symbol"})
STR_WIDTH = 15

_lib = None
_lib_failed = False


def _get_lib():
    global _lib, _lib_failed
    if _lib is None and not _lib_failed:
        try:
            from .. import native

            lib = native.load_library("table_parser")
            ll = ctypes.c_longlong
            lib.parse_table_mixed.restype = ll
            lib.parse_table_mixed.argtypes = [
                ctypes.c_void_p, ll, ll,  # text, nbytes, ncols
                ctypes.c_void_p, ctypes.c_void_p,  # is_str, slot
                ll, ll, ll, ll,  # n_num, n_str, str_width, max_rows
                ctypes.c_void_p, ctypes.c_void_p,  # out_num, out_str
                ctypes.c_int,  # num_threads
            ]
            lib.skip_rows.restype = ll
            lib.skip_rows.argtypes = [ctypes.c_void_p, ll, ll, ll]
            _lib = lib
        except Exception:  # pragma: no cover - toolchain missing
            _lib_failed = True
    return _lib


def parse_block(
    raw: bytes,
    offset: int,
    names: List[str],
    nrows: int,
    str_cols=STR_COLS,
    end: Optional[int] = None,
) -> Optional[Dict[str, np.ndarray]]:
    """Parse ``nrows`` table rows from ``raw[offset:end]`` into named columns.

    Returns None (caller falls back) when the native library is unavailable
    or the body is not a uniform table of the expected shape.
    """
    lib = _get_lib()
    if lib is None or nrows < 0:
        return None
    stop = len(raw) if end is None else end
    ncols = len(names)
    if ncols == 0:
        return {} if nrows == 0 else None
    is_str = np.array([1 if n in str_cols else 0 for n in names], np.int8)
    slot = np.zeros(ncols, np.int32)
    n_num = n_str = 0
    for j in range(ncols):
        if is_str[j]:
            slot[j] = n_str
            n_str += 1
        else:
            slot[j] = n_num
            n_num += 1
    # Column-major outputs (column stride = nrows): each parsed column is a
    # contiguous zero-copy slice, no per-column gather afterwards.
    out_num = np.empty((max(n_num, 1), max(nrows, 1)), np.float64)
    out_str = np.zeros(
        (max(n_str, 1), max(nrows, 1)) if n_str else (1, 1),
        dtype=f"S{STR_WIDTH}",
    )
    buf = np.frombuffer(raw, np.uint8)
    from ..utils.parallel import get_num_threads

    rc = lib.parse_table_mixed(
        buf.ctypes.data + offset,
        stop - offset,
        ncols,
        is_str.ctypes.data,
        slot.ctypes.data,
        n_num,
        n_str,
        STR_WIDTH,
        nrows,
        out_num.ctypes.data,
        out_str.ctypes.data,
        get_num_threads(),
    )
    if rc != nrows:
        return None
    cols: Dict[str, np.ndarray] = {}
    for j, n in enumerate(names):
        if is_str[j]:
            cols[n] = out_str[slot[j], :nrows].astype(str)
        else:
            cols[n] = out_num[slot[j], :nrows]
    return cols


def skip_rows(raw: bytes, begin: int, nrows: int) -> int:
    """Byte offset just past the ``nrows``-th non-empty line from ``begin``.

    Returns -1 if the buffer ends first (or the native lib is unavailable).
    """
    lib = _get_lib()
    if lib is None:
        return -1
    buf = np.frombuffer(raw, np.uint8)
    return int(lib.skip_rows(buf.ctypes.data, len(raw), begin, nrows))
