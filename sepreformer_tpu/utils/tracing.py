"""Tracing / profiling utilities.

The reference traces function entry/exit with a loguru decorator
(utils/decorators.py:4-17) and has no device profiler.  Here:
``trace_calls`` is the stdlib-logging equivalent; ``profile_trace`` wraps
the JAX profiler so hot steps can be captured for Perfetto/TensorBoard.
"""

from __future__ import annotations

import contextlib
import functools
import logging
import time

log = logging.getLogger("sepreformer_tpu.trace")


def trace_calls(level: int = logging.DEBUG):
    """Log entry/exit (+wall time) of the wrapped callable."""

    def wrapper(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            log.log(level, "-> %s", fn.__qualname__)
            t0 = time.perf_counter()
            try:
                return fn(*args, **kwargs)
            finally:
                log.log(
                    level, "<- %s (%.3fs)", fn.__qualname__,
                    time.perf_counter() - t0,
                )

        return wrapped

    return wrapper


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a JAX device profile (open with TensorBoard or Perfetto)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
