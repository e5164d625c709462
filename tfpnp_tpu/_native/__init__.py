"""Native (C++) runtime components, built on demand with g++.

The compute path is JAX/XLA/Pallas on the TPU; these are the *host*
runtime pieces (replay-ring engine) where the reference's equivalents are
Python object churn (utils/rpm.py, trainer.py:224-241). Loaded via ctypes
(no pybind11 in the image); a missing/failed toolchain degrades gracefully
to the pure-numpy paths.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

_HERE = Path(__file__).resolve().parent
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(src: Path, out: Path) -> bool:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", str(src), "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_replay_lib() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the replay engine; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = _HERE / "replay.cpp"
        so = _HERE / "libreplay.so"
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            if not _build(src, so):
                return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            return None
        lib.rb_create.restype = ctypes.c_void_p
        lib.rb_create.argtypes = [ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_int64),
                                  ctypes.c_int64]
        lib.rb_destroy.argtypes = [ctypes.c_void_p]
        lib.rb_size.restype = ctypes.c_int64
        lib.rb_size.argtypes = [ctypes.c_void_p]
        lib.rb_capacity.restype = ctypes.c_int64
        lib.rb_capacity.argtypes = [ctypes.c_void_p]
        lib.rb_insert_masked.restype = ctypes.c_int64
        lib.rb_insert_masked.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.rb_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_void_p)]
        _LIB = lib
        return _LIB
