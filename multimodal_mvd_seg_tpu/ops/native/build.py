"""Build + load the native persistence library.

Compiles ops/native/persistence.cpp with g++ on first use (cached next to
the source, keyed by source mtime) and returns a ctypes handle. No pybind11
in this image — the C ABI + ctypes is the binding layer (per environment
constraints)."""

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "persistence.cpp")
_LIB = os.path.join(_HERE, "libpersistence.so")
_lock = threading.Lock()
_lib = None


def _needs_build() -> bool:
    return (not os.path.isfile(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if _needs_build():
            cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                   "-march=native", _SRC, "-o", _LIB + ".tmp"]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            os.replace(_LIB + ".tmp", _LIB)
        lib = ctypes.CDLL(_LIB)
        c_i64p = ctypes.POINTER(ctypes.c_longlong)
        c_i32p = ctypes.POINTER(ctypes.c_int)
        lib.cubical_persistence.restype = ctypes.c_int
        lib.cubical_persistence.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            c_i32p, c_i64p, c_i64p]
        lib.simplicial_persistence.restype = ctypes.c_int
        lib.simplicial_persistence.argtypes = [
            ctypes.c_longlong, c_i32p, c_i64p, c_i64p,
            ctypes.c_int, ctypes.c_int, c_i32p, c_i64p, c_i64p]
        _lib = lib
        return _lib
