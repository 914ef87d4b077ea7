"""ctypes bindings for the native codec (kwave_tpu/native/codec.cpp).

The native library is the compiled specification of the reference CPU path — an
independent cross-check of the NumPy oracle and the fast host-side engine for wire-format
(de)serialization at the HDF5 edge. Falls back to None (callers use the NumPy paths) if
the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

_lib = None


def load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load libkwcodec.so; None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        from kwave_tpu.native.build import build

        path = build()
        lib = ctypes.CDLL(path)
    except Exception:
        return None

    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u16 = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    i32 = ctypes.c_int

    lib.kw_encode40.argtypes = [f32, f32, i64, i32, u8, u16, u16]
    lib.kw_decode40.argtypes = [u8, u16, u16, i64, i32, f32, f32]
    lib.kw_soa_to_bytes.argtypes = [u8, u16, u16, i64, u8]
    lib.kw_bytes_to_soa.argtypes = [u8, i64, u8, u16, u16]
    lib.kw_accum_step_float.argtypes = [f32, f32, f32, i64, i32, i64, i64,
                                        f32, f32, f32, f32, i32]
    lib.kw_accum_step_40b.argtypes = [u8, u8, f32, i64, i32, i64, i64,
                                      f32, f32, f32, f32, i32, i32]
    for fn in (lib.kw_encode40, lib.kw_decode40, lib.kw_soa_to_bytes,
               lib.kw_bytes_to_soa, lib.kw_accum_step_float, lib.kw_accum_step_40b):
        fn.restype = None
    _lib = lib
    return lib


def encode40(re: np.ndarray, im: np.ndarray, e: int):
    lib = load()
    re = np.ascontiguousarray(re, np.float32)
    im = np.ascontiguousarray(im, np.float32)
    n = re.size
    hdr = np.empty(re.shape, np.uint8)
    mr = np.empty(re.shape, np.uint16)
    mi = np.empty(re.shape, np.uint16)
    lib.kw_encode40(re.reshape(-1), im.reshape(-1), n, e,
                    hdr.reshape(-1), mr.reshape(-1), mi.reshape(-1))
    return hdr, mr, mi


def decode40(hdr: np.ndarray, mr: np.ndarray, mi: np.ndarray, e: int):
    lib = load()
    hdr = np.ascontiguousarray(hdr, np.uint8)
    mr = np.ascontiguousarray(mr, np.uint16)
    mi = np.ascontiguousarray(mi, np.uint16)
    re = np.empty(hdr.shape, np.float32)
    im = np.empty(hdr.shape, np.float32)
    lib.kw_decode40(hdr.reshape(-1), mr.reshape(-1), mi.reshape(-1), hdr.size, e,
                    re.reshape(-1), im.reshape(-1))
    return re, im


def soa_to_bytes(hdr: np.ndarray, mr: np.ndarray, mi: np.ndarray) -> np.ndarray:
    lib = load()
    hdr = np.ascontiguousarray(hdr, np.uint8).reshape(-1)
    mr = np.ascontiguousarray(mr, np.uint16).reshape(-1)
    mi = np.ascontiguousarray(mi, np.uint16).reshape(-1)
    out = np.empty(hdr.size * 5, np.uint8)
    lib.kw_soa_to_bytes(hdr, mr, mi, hdr.size, out)
    return out


def bytes_to_soa(raw: np.ndarray):
    lib = load()
    raw = np.ascontiguousarray(raw, np.uint8).reshape(-1)
    n = raw.size // 5
    hdr = np.empty(n, np.uint8)
    mr = np.empty(n, np.uint16)
    mi = np.empty(n, np.uint16)
    lib.kw_bytes_to_soa(raw, n, hdr, mr, mi)
    return hdr, mr, mi


def available() -> bool:
    return load() is not None
