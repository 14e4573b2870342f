"""ctypes binding for the native batch assembler (native/batch_assembler.cpp).

Compiles the shared library on first use (g++ -O3, cached next to the
source) and exposes `assemble_batch`. Falls back to a numpy implementation
when no compiler is available, so the framework never hard-depends on the
native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_NATIVE_FAILED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "batch_assembler.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libbatch_assembler.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _NATIVE_FAILED
    with _LOCK:
        if _LIB is not None or _NATIVE_FAILED:
            return _LIB
        src = os.path.abspath(_SRC)
        so = os.path.abspath(_SO)
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                     src, "-o", so],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.assemble_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),   # blob
                ctypes.POINTER(ctypes.c_int64),   # offsets
                ctypes.POINTER(ctypes.c_int32),   # heights
                ctypes.POINTER(ctypes.c_int32),   # widths
                ctypes.POINTER(ctypes.c_int32),   # indices
                ctypes.c_int32,                   # n
                ctypes.c_int32,                   # batch_capacity
                ctypes.c_int32,                   # out_h
                ctypes.c_int32,                   # out_w
                ctypes.POINTER(ctypes.c_uint8),   # out
                ctypes.c_int32,                   # n_threads
            ]
            lib.assemble_batch.restype = None
            _LIB = lib
        except Exception:  # noqa: BLE001 - fall back to numpy
            _NATIVE_FAILED = True
        return _LIB


def native_available() -> bool:
    return _load() is not None


def assemble_batch(
    blob: np.ndarray,  # (total_bytes,) uint8 concatenated images
    offsets: np.ndarray,  # (n_images,) int64 start of each image in blob
    heights: np.ndarray,  # (n_images,) int32
    widths: np.ndarray,  # (n_images,) int32
    indices: np.ndarray,  # (n,) int32 images to place in this batch
    batch_capacity: int,
    out_h: int,
    out_w: int,
    n_threads: int = 4,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Build a white-padded (batch_capacity, out_h, out_w, 1) uint8 batch."""
    if out is None:
        out = np.empty((batch_capacity, out_h, out_w, 1), np.uint8)
    assert out.flags["C_CONTIGUOUS"] and out.dtype == np.uint8

    indices = np.ascontiguousarray(indices, np.int32)
    lib = _load()
    if lib is not None:
        lib.assemble_batch(
            blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            np.int32(len(indices)),
            np.int32(batch_capacity),
            np.int32(out_h),
            np.int32(out_w),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            np.int32(n_threads),
        )
        return out

    # numpy fallback
    out.fill(255)
    for i, idx in enumerate(indices):
        h = min(int(heights[idx]), out_h)
        w = min(int(widths[idx]), out_w)
        img = blob[offsets[idx] : offsets[idx] + heights[idx] * widths[idx]]
        out[i, :h, :w, 0] = img.reshape(heights[idx], widths[idx])[:h, :w]
    return out
