"""ctypes binding for the native data-loader core (native/gather_windows.cc).

Falls back to vectorized numpy when the shared library isn't built. The
native path materializes a full batch of windows (gather + zero-pad + flip)
with multithreaded row copies — the host-side hot path when feeding a TPU at
tens of thousands of windows/sec.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _library():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libuplift_data.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.gather_windows_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int]
    lib.gather_windows_f32.restype = None
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _library() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype)) if arr is not None else None


def gather_windows(src: np.ndarray, indices: np.ndarray,
                   zero_mask: Optional[np.ndarray] = None,
                   do_flip: Optional[np.ndarray] = None,
                   flip_perm: Optional[np.ndarray] = None,
                   n_threads: int = 0) -> np.ndarray:
    """Gather (B, N, K, C) windows from the concatenated (T, K, C) pose store.

    zero_mask (B, N): True rows are zero-filled (zeros-padding mode).
    do_flip (B) + flip_perm (K): flipped examples get the joint permutation
    and x (channel 0) negation.
    """
    src = np.ascontiguousarray(src, dtype=np.float32)
    t, k, c = src.shape
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    b, n = indices.shape
    dst = np.empty((b, n, k, c), dtype=np.float32)

    lib = _library()
    if lib is not None:
        zm = None if zero_mask is None else np.ascontiguousarray(zero_mask, np.uint8)
        df = None if do_flip is None else np.ascontiguousarray(do_flip, np.uint8)
        fp = None if flip_perm is None else np.ascontiguousarray(flip_perm, np.int32)
        lib.gather_windows_f32(
            _ptr(src, ctypes.c_float), _ptr(indices, ctypes.c_int64),
            _ptr(zm, ctypes.c_uint8), _ptr(df, ctypes.c_uint8),
            _ptr(fp, ctypes.c_int32), _ptr(dst, ctypes.c_float),
            b, n, k, c, n_threads)
        return dst

    # numpy fallback
    dst[:] = src[indices]
    if zero_mask is not None:
        dst[zero_mask.astype(bool)] = 0.0
    if do_flip is not None and flip_perm is not None:
        sel = do_flip.astype(bool)
        flipped = dst[sel][:, :, flip_perm]
        flipped[..., 0] *= -1
        dst[sel] = flipped
    return dst
