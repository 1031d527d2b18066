"""Fixed-accuracy snapshot compression (the reference's zfp role).

The reference compresses every texture snapshot with zfp at accuracy 1e-6 on
a detached thread (src/Texture.cpp:123-181) and stores undo history as
compressed diffs (src/UndoHistory.cpp:19-67).  Here:

  compress(arr, accuracy)   -> bytes   (quantize+delta+varint in C++,
                                        then zlib)
  decompress(blob, shape)   -> float32 ndarray

Round-trip error is bounded by accuracy/2 per element (lossy, like zfp's
fixed-accuracy mode); ``accuracy=0`` selects a lossless raw-float path.
If the native library is unavailable the varint stage falls back to raw
little-endian int64 deltas (codec id 2) — same quantization contract,
bigger pre-zlib payload, no C++ needed to read or write.
"""

from __future__ import annotations

import ctypes
import struct
import zlib

import numpy as np

_CODEC_VARINT = 1   # C++ delta+zigzag+LEB128
_CODEC_RAW64 = 2    # numpy fallback: int64 deltas, little-endian
_CODEC_FLOAT = 3    # lossless raw float32 (accuracy == 0)

_HEADER = struct.Struct("<Bf")  # codec id, accuracy


def _lib():
    try:
        from .build import load_library

        lib = load_library()
        lib.dmg_snap_bound.restype = ctypes.c_int64
        lib.dmg_snap_bound.argtypes = [ctypes.c_int64]
        lib.dmg_snap_encode.restype = ctypes.c_int64
        lib.dmg_snap_encode.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.dmg_snap_decode.restype = ctypes.c_int64
        lib.dmg_snap_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        return lib
    except Exception:
        return None


def compress(arr, accuracy: float = 1e-6, level: int = 3) -> bytes:
    """Compress a float array to bytes (header + zlib payload)."""
    a = np.ascontiguousarray(arr, np.float32).ravel()
    if accuracy <= 0:
        return _HEADER.pack(_CODEC_FLOAT, 0.0) + zlib.compress(
            a.tobytes(), level)
    lib = _lib()
    if lib is not None:
        cap = int(lib.dmg_snap_bound(a.size))
        out = np.empty(cap, np.uint8)
        n = int(lib.dmg_snap_encode(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.size,
            ctypes.c_float(accuracy),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap))
        if n >= 0:
            return _HEADER.pack(_CODEC_VARINT, accuracy) + zlib.compress(
                out[:n].tobytes(), level)
    # numpy fallback: quantize + delta, raw int64 payload
    q = np.round(a.astype(np.float64) / accuracy).astype(np.int64)
    d = np.diff(q, prepend=np.int64(0))
    return _HEADER.pack(_CODEC_RAW64, accuracy) + zlib.compress(
        d.astype("<i8").tobytes(), level)


def decompress(blob: bytes, shape) -> np.ndarray:
    """Inverse of compress; returns float32 of the given shape."""
    codec, accuracy = _HEADER.unpack_from(blob)
    payload = zlib.decompress(blob[_HEADER.size:])
    n = int(np.prod(shape)) if shape else 1
    if codec == _CODEC_FLOAT:
        a = np.frombuffer(payload, np.float32, n)
    elif codec == _CODEC_RAW64:
        d = np.frombuffer(payload, "<i8", n)
        a = (np.cumsum(d) * np.float64(accuracy)).astype(np.float32)
    elif codec == _CODEC_VARINT:
        lib = _lib()
        if lib is None:
            raise RuntimeError("native codec required to read varint snapshot")
        buf = np.frombuffer(payload, np.uint8)
        a = np.empty(n, np.float32)
        got = int(lib.dmg_snap_decode(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
            ctypes.c_float(accuracy),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n))
        if got != n:
            raise ValueError("corrupt snapshot payload")
    else:
        raise ValueError(f"unknown snapshot codec {codec}")
    return a.reshape(shape)
