"""Time-axis resampling ops used by EGA pooling and U-Net skip/aux paths.

All shapes are static under jit, so the pool/upsample factor is known at
trace time and specializes to the cheapest formulation:

- integral downsample factor -> reshape + mean (pure VPU, no gather)
- integral upsample factor   -> jnp.repeat
- non-integral               -> static precomputed index/segment maps

Behavioral reference: ``adaptive_avg_pool1d`` in EGA (modules/network.py:145)
and nearest ``F.upsample`` in skip fusion / aux heads
(modules/module.py:210, model.py:49).  PyTorch semantics reproduced exactly:
adaptive pool averages input[floor(i*T/o) : ceil((i+1)*T/o)); nearest
upsample picks input[floor(i * T_in / T_out)].
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def adaptive_avg_pool_time(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Adaptive average pool over the time axis of [B, T, F] -> [B, out_len, F]."""
    b, t, f = x.shape
    if t == out_len:
        return x
    if t % out_len == 0:
        k = t // out_len
        return x.reshape(b, out_len, k, f).mean(axis=2)
    # General case: static segment-mean matrix (out_len x T, row-normalized).
    starts = np.floor(np.arange(out_len) * t / out_len).astype(np.int64)
    ends = np.ceil((np.arange(out_len) + 1) * t / out_len).astype(np.int64)
    mat = np.zeros((out_len, t), dtype=np.float32)
    for i, (s, e) in enumerate(zip(starts, ends)):
        mat[i, s:e] = 1.0 / (e - s)
    pool = mat.astype(np.dtype(x.dtype))  # numpy constant (host embed)
    return jnp.einsum("ot,btf->bof", pool, x, preferred_element_type=x.dtype)


def nearest_upsample_time(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Nearest-neighbor upsample over the time axis of [B, T, F] -> [B, out_len, F]."""
    b, t, f = x.shape
    if t == out_len:
        return x
    if out_len % t == 0:
        return jnp.repeat(x, out_len // t, axis=1)
    idx = np.floor(np.arange(out_len) * t / out_len).astype(np.int32)
    return jnp.take(x, np.asarray(idx), axis=1)
