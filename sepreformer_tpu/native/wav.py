"""ctypes wrappers over the native wav loader."""

from __future__ import annotations

import ctypes
from typing import List, Optional, Sequence, Tuple

import numpy as np

from sepreformer_tpu.native.build import load_library


def native_available() -> bool:
    return load_library() is not None


def read_wav_native(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Read one wav via C++; None if the native lib is unavailable or the
    file can't be parsed (caller falls back to scipy)."""
    lib = load_library()
    if lib is None:
        return None
    buf = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rate = ctypes.c_int32()
    rc = lib.sep_read_wav(path.encode(), ctypes.byref(buf),
                          ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(buf, shape=(n.value,)).copy()
    finally:
        lib.sep_free(buf)
    return arr, int(rate.value)


def read_wav_batch_native(
    paths: Sequence[str],
    crop_len: int,
    offsets: Optional[Sequence[int]] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Parallel batch load -> (batch [B, crop_len] f32 zero-padded,
    true lengths [B], rates [B]); None when native lib unavailable."""
    lib = load_library()
    if lib is None:
        return None
    b = len(paths)
    out = np.zeros((b, crop_len), np.float32)
    lengths = np.zeros(b, np.int64)
    rates = np.zeros(b, np.int32)
    c_paths = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    if offsets is None:
        c_offsets = None
    else:
        c_offsets = (ctypes.c_int64 * b)(*[int(o) for o in offsets])
    rc = lib.sep_read_wav_batch(
        c_paths, b, c_offsets, crop_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return out, lengths, rates
