"""ctypes bindings for the native streaming runtime (ring.cc).

Builds the shared library on first import if missing or stale (g++ is part
of the baked toolchain; no pybind11 in this environment, so the C ABI +
ctypes is the binding layer). All fallible paths degrade gracefully: if the
toolchain is unavailable, ``available()`` returns False and the pure-Python
driver paths keep working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "SampleRing", "FileSource", "NativeBuildError"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ring.cc")
_LIB = os.path.join(_HERE, "_fdc_native.so")

_lock = threading.Lock()
_lib = None
_build_error = None


class NativeBuildError(RuntimeError):
    pass


def _build():
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", _LIB,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise NativeBuildError(
            f"native build failed: {' '.join(cmd)}\n{proc.stderr}"
        )


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            raise _build_error
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
        except (OSError, NativeBuildError) as e:
            _build_error = NativeBuildError(str(e))
            raise _build_error

        lib.fdc_ring_create.restype = ctypes.c_void_p
        lib.fdc_ring_create.argtypes = [ctypes.c_size_t]
        lib.fdc_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.fdc_ring_capacity.restype = ctypes.c_size_t
        lib.fdc_ring_capacity.argtypes = [ctypes.c_void_p]
        lib.fdc_ring_size.restype = ctypes.c_size_t
        lib.fdc_ring_size.argtypes = [ctypes.c_void_p]
        lib.fdc_ring_close.argtypes = [ctypes.c_void_p]
        lib.fdc_ring_closed.restype = ctypes.c_int
        lib.fdc_ring_closed.argtypes = [ctypes.c_void_p]
        for name in ("fdc_ring_push", "fdc_ring_pop"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_size_t
            fn.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_size_t,
            ]
        for name in ("fdc_ring_push_blocking", "fdc_ring_pop_blocking"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_size_t
            fn.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_size_t,
                ctypes.c_double,
            ]
        lib.fdc_filesource_start.restype = ctypes.c_void_p
        lib.fdc_filesource_start.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ]
        lib.fdc_filesource_stop.argtypes = [ctypes.c_void_p]
        lib.fdc_filesource_samples_read.restype = ctypes.c_uint64
        lib.fdc_filesource_samples_read.argtypes = [ctypes.c_void_p]
        lib.fdc_filesource_done.restype = ctypes.c_int
        lib.fdc_filesource_done.argtypes = [ctypes.c_void_p]
        lib.fdc_filesource_error.restype = ctypes.c_int
        lib.fdc_filesource_error.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeBuildError:
        return False


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class SampleRing:
    """SPSC complex64 sample ring backed by the native library."""

    def __init__(self, capacity_samples: int):
        self._lib = _load()
        self._h = self._lib.fdc_ring_create(capacity_samples)
        if not self._h:
            raise MemoryError("fdc_ring_create failed")

    @property
    def capacity(self) -> int:
        return self._lib.fdc_ring_capacity(self._h)

    def __len__(self) -> int:
        return self._lib.fdc_ring_size(self._h)

    def close(self):
        self._lib.fdc_ring_close(self._h)

    @property
    def closed(self) -> bool:
        return bool(self._lib.fdc_ring_closed(self._h))

    def push(self, samples: np.ndarray, blocking=False, timeout=10.0) -> int:
        x = np.ascontiguousarray(samples, np.complex64).view(np.float32)
        n = len(x) // 2
        if blocking:
            return self._lib.fdc_ring_push_blocking(
                self._h, _fptr(x), n, timeout
            )
        return self._lib.fdc_ring_push(self._h, _fptr(x), n)

    def pop(self, n: int, blocking=False, timeout=10.0) -> np.ndarray:
        out = np.empty(2 * n, np.float32)
        if blocking:
            got = self._lib.fdc_ring_pop_blocking(self._h, _fptr(out), n, timeout)
        else:
            got = self._lib.fdc_ring_pop(self._h, _fptr(out), n)
        return out[: 2 * got].view(np.complex64)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.fdc_ring_destroy(self._h)
                self._h = None
        except Exception:
            pass


class FileSource:
    """Background-thread complex64 file reader feeding a SampleRing."""

    def __init__(self, ring: SampleRing, path: str, chunk: int = 65536,
                 loop: bool = False):
        self._lib = _load()
        self._ring = ring  # keep alive
        self._h = self._lib.fdc_filesource_start(
            ring._h, str(path).encode(), chunk, int(loop)
        )

    @property
    def samples_read(self) -> int:
        return self._lib.fdc_filesource_samples_read(self._h)

    @property
    def done(self) -> bool:
        return bool(self._lib.fdc_filesource_done(self._h))

    @property
    def error(self) -> bool:
        return bool(self._lib.fdc_filesource_error(self._h))

    def stop(self):
        if getattr(self, "_h", None):
            self._lib.fdc_filesource_stop(self._h)
            self._h = None

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass
