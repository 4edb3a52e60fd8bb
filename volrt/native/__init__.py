"""Native (C++) runtime components, loaded via ctypes.

The reference's loader and host hot loops are native C++ (ddsbase + the ESL
min/max scan); this package is their equivalent here. The library is built
on demand with the system compiler and cached next to the source; every entry
point has a pure-Python fallback, so the framework works without a compiler.

Set ``VOLRT_NATIVE=0`` to force the Python fallbacks.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "volrt_native.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libvolrt_native.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    # Compile to a unique temp file and os.replace() it into place: atomic on
    # POSIX, so concurrent processes (tests spawn CLI subprocesses) never
    # dlopen a partially written .so. Falls back to a user cache directory
    # when the package directory is read-only (e.g. system installs).
    global _LIB
    for target_dir in (os.path.dirname(_LIB), _cache_dir()):
        target = os.path.join(target_dir, os.path.basename(_LIB))
        tmp = f"{target}.tmp.{os.getpid()}"
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, target)
            _LIB = target
            return True
        except Exception:
            try:
                os.unlink(tmp)
            except OSError:
                pass
    return False


def _cache_dir() -> str:
    base = os.environ.get(
        "XDG_CACHE_HOME", os.path.expanduser("~/.cache")
    )
    path = os.path.join(base, "volrt")
    os.makedirs(path, exist_ok=True)
    return path


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if os.environ.get("VOLRT_NATIVE") == "0":
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        global _LIB
        candidates = [
            _LIB, os.path.join(_cache_dir(), os.path.basename(_LIB))
        ]
        fresh = [
            p for p in candidates
            if os.path.exists(p)
            and os.path.getmtime(p) >= os.path.getmtime(_SRC)
        ]
        if fresh:
            _LIB = fresh[0]
        elif not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.volrt_dds_decode.restype = ctypes.c_int
        lib.volrt_dds_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.volrt_esl_minmax.restype = ctypes.c_int
        lib.volrt_esl_minmax.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.volrt_histogram.restype = ctypes.c_int
        lib.volrt_histogram.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.volrt_quantize16.restype = ctypes.c_int
        lib.volrt_quantize16.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def dds_decode(payload: bytes, block: int = 0) -> bytes | None:
    """Native DDS body decode; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    # First call with a generous guess; retry once with the exact size.
    cap = max(len(payload) * 4, 1 << 20)
    for _ in range(2):
        out = np.empty(cap, np.uint8)
        n_out = ctypes.c_int64(0)
        rc = lib.volrt_dds_decode(
            payload, len(payload), block,
            out.ctypes.data_as(ctypes.c_void_p), cap,
            ctypes.byref(n_out),
        )
        if rc == 0:
            return out[: n_out.value].tobytes()
        if rc == 1:
            cap = n_out.value
            continue
        raise ValueError("corrupt DDS stream (native decoder)")
    raise RuntimeError("native DDS decode failed to size output")


def esl_minmax(volume: np.ndarray, block: int) -> tuple[np.ndarray, np.ndarray] | None:
    """Native per-block (min, max) grids of shape ceil(dims/block)."""
    lib = load()
    if lib is None:
        return None
    vol = np.ascontiguousarray(volume, np.uint8)
    d, h, w = vol.shape
    gd, gh, gw = (-(-d // block), -(-h // block), -(-w // block))
    mn = np.empty((gd, gh, gw), np.uint8)
    mx = np.empty((gd, gh, gw), np.uint8)
    rc = lib.volrt_esl_minmax(
        vol.ctypes.data_as(ctypes.c_void_p), d, h, w, block,
        mn.ctypes.data_as(ctypes.c_void_p),
        mx.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return mn, mx


def histogram(volume: np.ndarray) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    vol = np.ascontiguousarray(volume, np.uint8)
    bins = np.zeros(256, np.int64)
    lib.volrt_histogram(
        vol.ctypes.data_as(ctypes.c_void_p), vol.size,
        bins.ctypes.data_as(ctypes.c_void_p),
    )
    return bins


def quantize16(v16: "np.ndarray", linear: bool = False):
    """Native gradient-weighted 16->8 bit quantize of a uint16 (D, H, W)
    volume; None if the library is unavailable (callers fall back to the
    numpy path, which this matches bit for bit)."""
    lib = load()
    if lib is None:
        return None
    v = np.ascontiguousarray(v16, np.uint16)
    d, h, w = v.shape
    out = np.empty((d, h, w), np.uint8)
    rc = lib.volrt_quantize16(
        v.ctypes.data_as(ctypes.c_void_p), d, h, w, int(linear),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return out
