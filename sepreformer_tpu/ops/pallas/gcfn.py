"""Fused GCFN kernel: LN -> Linear(F->6F) -> depthwise k3 -> GLU ->
Linear(3F->F) -> LayerScale residual, in one VMEM-resident pass.

Why: the 6F-wide intermediates ([B, T, 768] f32 for SepReformer-B) make the
XLA version HBM-bandwidth-bound — profiling on v5e showed ~1.1-1.4 ms per
full-resolution GCFN, ~60% of the whole forward across the model's ~50
GCFNs.  Fusing the chain keeps the wide tensors in VMEM: HBM traffic drops
from ~550 MB to ~32 MB per full-length block (x read + out write +
weights).

The depthwise k3 needs one halo row per block edge; instead of halo-overlap
DMA, the caller passes the two LN-input boundary rows per block
([B, nT, 2, F], zero rows at sequence edges) and the kernel recomputes
their LN+projection — 2 extra rows of work per block buys disjoint
BlockSpecs.  Sequence-edge contributions are masked to zero to match
torch's zero-padding in u-space (the conv pads its *input*, i.e. the
projected features).

Behavioral reference: GCFN (modules/network.py:46-66).  Gradients fall back
to the XLA reference via custom_vjp (recompute).  Dropout-active training
uses the XLA path (policy handled by the flax module).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_BLOCK = 512
MIN_BLOCK = 64


def matmul_dtype(x_dtype) -> jnp.dtype:
    """MXU operand dtype policy: bf16 streams run bf16 multiplies with f32
    accumulation (preferred_element_type) — the native MXU mode, ~2x the
    f32 throughput on v5e; everything else stays f32."""
    return jnp.bfloat16 if x_dtype == jnp.bfloat16 else jnp.float32


def pick_block(t: int) -> int:
    """Time-block size: t itself when it fits (Mosaic allows full-dim
    blocks of any size), else the largest divisor of t in
    [MIN_BLOCK, MAX_BLOCK] that is a multiple of 8 (sublane tiling
    requirement); 0 if none."""
    if t <= MAX_BLOCK:
        return t
    for bt in range(MAX_BLOCK, MIN_BLOCK - 1, -8):
        if t % bt == 0:
            return bt
    return 0


def _gcfn_kernel(
    x_ref, xb_ref, lns_ref, lnb_ref, win_ref, bin_ref, wdw_ref, bdw_ref,
    wout_ref, bout_ref, ls_ref, out_ref, *, eps: float, hidden: int,
    bt: int, nt: int,
):
    bi = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)            # [BT, F]
    xb = xb_ref[0, 0].astype(jnp.float32)       # [2, F]
    both = jnp.concatenate([x, xb], axis=0)     # [BT+2, F]
    mean = jnp.mean(both, axis=1, keepdims=True)
    centered = both - mean
    var = jnp.mean(centered * centered, axis=1, keepdims=True)
    xn = centered * jax.lax.rsqrt(var + eps)
    xn = xn * lns_ref[0] + lnb_ref[0]
    # weights arrive pre-cast (bf16 for bf16 streams); matching the operand
    # dtypes puts the MXU in its native bf16 mode, accumulating f32
    u = jnp.dot(xn.astype(win_ref.dtype), win_ref[:],
                preferred_element_type=jnp.float32)
    u = u + bin_ref[0]
    u_main = u[:bt]
    # sequence-edge boundaries contribute zeros (torch zero-pads u-space)
    not_first = (bi > 0).astype(jnp.float32)
    not_last = (bi < nt - 1).astype(jnp.float32)
    u_prev = jnp.concatenate([u[bt:bt + 1] * not_first, u_main[:-1]], axis=0)
    u_next = jnp.concatenate([u_main[1:], u[bt + 1:bt + 2] * not_last], axis=0)
    w0 = wdw_ref[0]
    w1 = wdw_ref[1]
    w2 = wdw_ref[2]
    y = u_prev * w0 + u_main * w1 + u_next * w2 + bdw_ref[0]
    half = hidden // 2
    g = y[:, :half] * jax.nn.sigmoid(y[:, half:])
    out = jnp.dot(g.astype(wout_ref.dtype), wout_ref[:],
                  preferred_element_type=jnp.float32)
    out = out + bout_ref[0]
    out_ref[0] = (x + ls_ref[0] * out).astype(out_ref.dtype)


def gcfn_reference(x, params, eps: float):
    """XLA reference with identical math (used for tests and the vjp)."""
    lns, lnb, win, bin_, wdw, bdw, wout, bout, ls = params
    mean = jnp.mean(x, axis=-1, keepdims=True)
    c = x - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    xn = c * jax.lax.rsqrt(var + eps) * lns + lnb
    u = jnp.einsum("btf,fh->bth", xn, win) + bin_
    up = jnp.pad(u, ((0, 0), (1, 1), (0, 0)))
    t = x.shape[1]
    y = (up[:, :t] * wdw[0] + up[:, 1:t + 1] * wdw[1]
         + up[:, 2:t + 2] * wdw[2] + bdw)
    half = y.shape[-1] // 2
    g = y[..., :half] * jax.nn.sigmoid(y[..., half:])
    return x + ls * (jnp.einsum("bth,hf->btf", g, wout) + bout)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _fused_gcfn_impl(x, params, eps: float, interpret: bool = False):
    lns, lnb, win, bin_, wdw, bdw, wout, bout, ls = params
    b, t, f = x.shape
    hidden = win.shape[1]
    bt = pick_block(t)
    if bt == 0:
        return gcfn_reference(x, params, eps)
    nt = t // bt
    mm = matmul_dtype(x.dtype)
    win = win.astype(mm)
    wout = wout.astype(mm)

    # boundary LN-input rows per block; zero rows at sequence edges
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    idx_prev = np.arange(nt) * bt          # padded index of orig i*bt - 1
    idx_next = np.arange(nt) * bt + bt + 1  # padded index of orig i*bt + bt
    xb = jnp.stack(
        [jnp.take(xp, np.asarray(idx_prev), axis=1),
         jnp.take(xp, np.asarray(idx_next), axis=1)],
        axis=2,
    )                                       # [B, nT, 2, F]

    def row2d(a):
        return a.reshape(1, -1)

    kernel = functools.partial(
        _gcfn_kernel, eps=eps, hidden=hidden, bt=bt, nt=nt
    )
    full = lambda shape: pl.BlockSpec(shape, lambda bb, ii: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, bt, f), lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, f), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            full((1, f)), full((1, f)),
            full((f, hidden)), full((1, hidden)),
            full((3, hidden)), full((1, hidden)),
            full((hidden // 2, f)), full((1, f)),
            full((1, f)),
        ],
        out_specs=pl.BlockSpec((1, bt, f), lambda bb, ii: (bb, ii, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, f), x.dtype),
        interpret=interpret,
    )(
        x, xb, row2d(lns), row2d(lnb), win, row2d(bin_), wdw, row2d(bdw),
        wout, row2d(bout), row2d(ls),
    )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_gcfn(x, params, eps: float, interpret: bool = False):
    """Fused GCFN with XLA-reference gradients (recompute)."""
    return _fused_gcfn_impl(x, params, eps, interpret)


def _fwd(x, params, eps, interpret):
    return _fused_gcfn_impl(x, params, eps, interpret), (x, params)


def _bwd(eps, interpret, res, g):
    x, params = res
    _, vjp = jax.vjp(lambda x, p: gcfn_reference(x, p, eps), x, params)
    return vjp(g)


fused_gcfn.defvjp(_fwd, _bwd)
