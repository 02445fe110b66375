"""Build + load the native persistence library.

Compiles ops/native/persistence.cpp with g++ on first use (cached next to
the source, keyed by source mtime) and returns a ctypes handle. No pybind11
in this image — the C ABI + ctypes is the binding layer (per environment
constraints)."""

import ctypes
import hashlib
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "persistence.cpp")
_lock = threading.Lock()
_lib = None


def _lib_path() -> str:
    """Cache the built library under ~/.cache keyed by source content hash
    (so a checkout upgrade or platform change rebuilds, and read-only
    installs still work); fall back to next-to-source if the cache dir is
    unusable. No binary is shipped in the tree."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_root = os.environ.get("XDG_CACHE_HOME",
                                os.path.join(os.path.expanduser("~"),
                                             ".cache"))
    cache_dir = os.path.join(cache_root, "mvdseg_tpu")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        probe = os.path.join(cache_dir, ".write_probe")
        with open(probe, "w"):
            pass
        os.remove(probe)
    except OSError:
        cache_dir = _HERE
    return os.path.join(cache_dir, f"libpersistence-{digest}.so")


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib_path = _lib_path()
        if not os.path.isfile(lib_path):
            tmp = f"{lib_path}.tmp.{os.getpid()}"
            cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                   "-march=native", _SRC, "-o", tmp]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            os.replace(tmp, lib_path)
        lib = ctypes.CDLL(lib_path)
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
