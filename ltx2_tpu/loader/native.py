"""ctypes bindings for the native weight-conversion library.

The hot host-side work of streaming a 46 GB checkpoint — bf16 widening,
fp8-E4M3 dequantization, bf16 narrowing — runs in C++ (native/
weight_convert.cpp), threads sharded over the tensor. Falls back to
numpy/ml_dtypes transparently when the library isn't built.

Build once with `make -C native`; `ensure_built()` also attempts an
on-demand g++ build.
"""

from __future__ import annotations

import ctypes
import subprocess
from functools import lru_cache
from pathlib import Path
from typing import Optional

import ml_dtypes
import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libweight_convert.so"


def ensure_built(quiet: bool = True) -> bool:
    if _LIB_PATH.exists():
        return True
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=quiet,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


@lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    if not ensure_built():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    u16p = ctypes.POINTER(ctypes.c_uint16)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.bf16_to_f32.argtypes = [u16p, f32p, ctypes.c_size_t]
    lib.f32_to_bf16.argtypes = [f32p, u16p, ctypes.c_size_t]
    lib.fp8_e4m3_dequant_f32.argtypes = [u8p, f32p, ctypes.c_size_t, ctypes.c_float]
    lib.fp8_e4m3_dequant_bf16.argtypes = [u8p, u16p, ctypes.c_size_t, ctypes.c_float]
    return lib


def native_available() -> bool:
    return _lib() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def bf16_to_f32(arr: np.ndarray) -> np.ndarray:
    """bf16 -> f32 widening."""
    lib = _lib()
    if lib is None:
        return np.asarray(arr, dtype=ml_dtypes.bfloat16).astype(np.float32)
    src = np.ascontiguousarray(arr).view(np.uint16)
    out = np.empty(src.shape, np.float32)
    lib.bf16_to_f32(_ptr(src, ctypes.c_uint16), _ptr(out, ctypes.c_float), src.size)
    return out.reshape(arr.shape)


def f32_to_bf16(arr: np.ndarray) -> np.ndarray:
    """f32 -> bf16 narrowing (round-to-nearest-even)."""
    lib = _lib()
    if lib is None:
        return np.asarray(arr, np.float32).astype(ml_dtypes.bfloat16)
    src = np.ascontiguousarray(arr, np.float32)
    out = np.empty(src.shape, np.uint16)
    lib.f32_to_bf16(_ptr(src, ctypes.c_float), _ptr(out, ctypes.c_uint16), src.size)
    return out.view(ml_dtypes.bfloat16).reshape(arr.shape)


def fp8_e4m3_dequant(arr: np.ndarray, scale: float, target: str = "bfloat16") -> np.ndarray:
    """fp8-E4M3 -> (w * scale) in the target dtype."""
    lib = _lib()
    if lib is None:
        wide = np.asarray(arr, dtype=ml_dtypes.float8_e4m3fn).astype(np.float32) * scale
        if target == "bfloat16":
            return wide.astype(ml_dtypes.bfloat16)
        return wide.astype(np.dtype(target))
    src = np.ascontiguousarray(arr).view(np.uint8)
    if target == "bfloat16":
        out = np.empty(src.shape, np.uint16)
        lib.fp8_e4m3_dequant_bf16(
            _ptr(src, ctypes.c_uint8), _ptr(out, ctypes.c_uint16), src.size, scale
        )
        return out.view(ml_dtypes.bfloat16).reshape(arr.shape)
    out = np.empty(src.shape, np.float32)
    lib.fp8_e4m3_dequant_f32(
        _ptr(src, ctypes.c_uint8), _ptr(out, ctypes.c_float), src.size, scale
    )
    return out.reshape(arr.shape).astype(np.dtype(target), copy=False)
