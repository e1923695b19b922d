"""On-demand g++ build of the native library, cached beside the source."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

log = logging.getLogger("sepreformer_tpu.native")

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _src_dir() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def build_library(force: bool = False) -> Optional[str]:
    """Compile wavio.cc -> libsepnative.so.  Returns the path or None."""
    src = os.path.join(_src_dir(), "wavio.cc")
    out = os.path.join(_src_dir(), "libsepnative.so")
    if os.path.exists(out) and not force:
        if os.path.getmtime(out) >= os.path.getmtime(src):
            return out
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        src, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.debug("native build failed: %s", e)
        return None


def load_library() -> Optional[ctypes.CDLL]:
    """Build (if needed) and dlopen the native library; None on failure."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = build_library()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError as e:
            log.debug("dlopen failed: %s", e)
            return None
        lib.sep_read_wav.restype = ctypes.c_int
        lib.sep_read_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sep_free.restype = None
        lib.sep_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.sep_read_wav_batch.restype = ctypes.c_int
        lib.sep_read_wav_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
        return _LIB
