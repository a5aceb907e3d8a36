"""ctypes bindings for the native host library (``native/cetpu_native.cpp``).

The C++ library covers the reference's host-side native surface (quant_cpu
fixed-point/partial quantization, fibbinary nearest-codeword search,
DataLoader-style window packing) for paths where device round-trips are
wasteful. Auto-builds with ``make`` on first import if the shared object is
missing; falls back to ``available = False`` (pure-JAX paths cover all
functionality) when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libcetpu_native.so"

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    i64, f32p, i64p = ctypes.c_int64, np.ctypeslib.ndpointer(np.float32), np.ctypeslib.ndpointer(np.int64)
    c_int, c_float, c_uint64 = ctypes.c_int, ctypes.c_float, ctypes.c_uint64
    lib.cetpu_fixed_point_quantize_nearest.argtypes = [f32p, f32p, i64, c_int, c_int, c_int, c_int]
    lib.cetpu_fixed_point_quantize_stochastic.argtypes = [f32p, f32p, i64, c_int, c_int, c_int, c_int, c_uint64]
    lib.cetpu_fixed_point_quantize_partial.argtypes = [f32p, f32p, i64, c_int, c_int, c_float, c_int, c_int, c_int]
    lib.cetpu_nearest_codeword.argtypes = [f32p, f32p, i64, f32p, i64]
    lib.cetpu_fibbinary_ints.argtypes = [c_int, i64p, i64]
    lib.cetpu_fibbinary_ints.restype = i64
    lib.cetpu_pack_windows.argtypes = [f32p, f32p, i64, i64, i64, i64, i64p, i64]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def fixed_point_quantize(x: np.ndarray, wl: int, fl: int, *, clamp=True,
                         symmetric=False, rounding="nearest", seed=0) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty_like(x)
    if rounding == "nearest":
        lib.cetpu_fixed_point_quantize_nearest(
            x.ravel(), out.ravel(), x.size, wl, fl, int(clamp), int(symmetric)
        )
    else:
        lib.cetpu_fixed_point_quantize_stochastic(
            x.ravel(), out.ravel(), x.size, wl, fl, int(clamp), int(symmetric), seed
        )
    return out


def fixed_point_quantize_partial(x: np.ndarray, percentage: float, wl: int,
                                 fl: int, *, clamp=True, symmetric=False,
                                 proximal=True) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty_like(x)
    lib.cetpu_fixed_point_quantize_partial(
        x.ravel(), out.ravel(), x.size, wl, fl, percentage, int(clamp),
        int(symmetric), int(proximal),
    )
    return out


def nearest_codeword(x: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    cb = np.ascontiguousarray(codebook, dtype=np.float32)
    out = np.empty_like(x)
    lib.cetpu_nearest_codeword(x.ravel(), out.ravel(), x.size, cb, cb.size)
    return out


def fibbinary_ints(max_bits: int) -> np.ndarray:
    lib = _load()
    cap = 1 << max(max_bits - 1, 1)
    buf = np.empty(cap + 2, dtype=np.int64)
    n = lib.cetpu_fibbinary_ints(max_bits, buf, buf.size)
    return buf[:n].copy()


def pack_windows(h: np.ndarray, starts: np.ndarray, win_len: int) -> np.ndarray:
    """complex64 ``[N, slots, nr, nt]`` + per-sample starts -> float32
    ``[N, win_len, nr*nt*2]`` in LoadBatch layout."""
    lib = _load()
    assert h.dtype == np.complex64
    num, slots, nr, nt = h.shape
    interleaved = np.ascontiguousarray(h).view(np.float32)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    out = np.empty((num, win_len, nr * nt * 2), dtype=np.float32)
    lib.cetpu_pack_windows(
        interleaved.ravel(), out.ravel(), num, slots, nr, nt, starts, win_len
    )
    return out
