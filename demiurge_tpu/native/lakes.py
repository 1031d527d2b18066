"""ctypes binding for the native lake solver (drop-in for
ops.flow.solve_lakes_numpy)."""

from __future__ import annotations

import ctypes

import numpy as np


def native_available() -> bool:
    try:
        from .build import load_library

        load_library()
        return True
    except Exception:
        return False


def solve_lakes_native(mask, mouth, height, parent, grid):
    """Same signature/result as ops.flow.solve_lakes_numpy."""
    import math

    from ..ops.flow import LakeSolution
    from .build import load_library

    lib = load_library()
    fn = lib.solve_lakes
    fn.restype = ctypes.c_int

    H, W = grid.shape
    N = H * W
    wrap = abs(grid.lam1 - grid.lam0) > 2 * math.pi - 1e-4

    mask32 = np.ascontiguousarray(mask, np.int32)
    mouth8 = np.ascontiguousarray(np.asarray(mouth, bool).view(np.uint8))
    h32 = np.ascontiguousarray(height, np.float32)

    nsinks = int(((mask32 & 16) != 0).sum()) + 1
    conn_from = np.zeros(nsinks, np.int32)
    conn_to = np.zeros(nsinks, np.int32)
    conn_h = np.zeros(nsinks, np.float32)
    n_conn = np.zeros(1, np.int32)
    lake_wh = np.zeros(N, np.float32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    ret = fn(ptr(mask32, ctypes.c_int32), ptr(mouth8, ctypes.c_uint8),
             ptr(h32, ctypes.c_float), ctypes.c_int(H), ctypes.c_int(W),
             ctypes.c_int(1 if wrap else 0),
             ptr(conn_from, ctypes.c_int32), ptr(conn_to, ctypes.c_int32),
             ptr(conn_h, ctypes.c_float), ptr(n_conn, ctypes.c_int32),
             ptr(lake_wh, ctypes.c_float))
    assert ret == 0
    n = int(n_conn[0])
    return LakeSolution(conn_from[:n].astype(np.int64),
                        conn_to[:n].astype(np.int64),
                        conn_h[:n].copy(), lake_wh)
