"""Native (C++) host-side components, bound via ctypes.

Built on demand with g++ (no pybind11 in this image); every consumer has a
pure-Python fallback, so the package works without a toolchain.
"""

from sepreformer_tpu.native.build import load_library  # noqa: F401
from sepreformer_tpu.native.wav import (  # noqa: F401
    native_available,
    read_wav_batch_native,
    read_wav_native,
)
