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
# target rows per software-pipeline sub-chunk (see _gcfn_pipe_core)
SUB_ROWS = 128


def matmul_dtype(x_dtype) -> jnp.dtype:
    """MXU operand dtype policy: bf16 streams run bf16 multiplies with f32
    accumulation (preferred_element_type) — the native MXU mode, ~2x the
    f32 throughput on v5e; everything else stays f32."""
    return jnp.bfloat16 if x_dtype == jnp.bfloat16 else jnp.float32


def resolve_mxu(mxu: str, x_dtype, interpret: bool) -> jnp.dtype:
    """In-kernel MXU operand dtype for f32 streams.

    "auto" resolves to f32 — MEASURED (measure_gcfn_mxu.py →
    MEASURE_GCFN_MXU.json, v5e): bf16 operands are bit-identical to the
    f32 dots (max_rel_diff 0.0 — Mosaic already rounds f32 MXU operands
    to bf16 on this part, same as XLA's default dot precision) and only
    2.5% faster standalone (690.0 vs 707.7 us at [4, 8000, 128]→768),
    which the full-model forward does not see (23.69 vs 23.57 ms — the
    pre-cast overhead eats it).  The kernel's 19%-MXU ceiling is the
    serialized VPU stages (LN/GLU/dw3) between the two dots, not dot
    throughput.  "bf16" keeps forcing the explicit cast for re-testing
    on other parts; interpret mode (CPU tests) always keeps f32 so
    interpreter equivalence checks stay exact.
    """
    if interpret:
        return matmul_dtype(x_dtype)
    if mxu == "bf16":
        return jnp.bfloat16
    return matmul_dtype(x_dtype)


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


# block-size cap for the PIPELINED kernel: its live wide intermediates
# are per-~128-row-chunk, not per-block, so bt only costs x/xa/out VMEM
# ([bt, F] each) — larger blocks mean fewer grid steps (less per-step
# fixed cost).  0 disables the widening (A/B knob).
MAX_BLOCK_PIPE = 2000


def pick_block_pipe(t: int) -> int:
    """Block size for the pipelined kernel: like pick_block but allowed
    up to MAX_BLOCK_PIPE.  Falls back to pick_block when widening is
    disabled or finds nothing."""
    if MAX_BLOCK_PIPE <= MAX_BLOCK:
        return pick_block(t)
    if t <= MAX_BLOCK_PIPE:
        return t
    for bt in range(MAX_BLOCK_PIPE, MIN_BLOCK - 1, -8):
        if t % bt == 0:
            return bt
    return pick_block(t)


def pipe_chunks(bt: int):
    """Static (start, size) sub-chunks covering [0, bt) for the pipelined
    kernel: ~SUB_ROWS rows each, sizes a multiple of 8 where possible
    (sublane tiling), at least 2 chunks — or None when the block is too
    small to pipeline (single-shot kernel is then used)."""
    if bt < 2 * MIN_BLOCK:
        return None
    k = max(2, -(-bt // SUB_ROWS))
    base = -(-bt // k)
    base = -(-base // 8) * 8
    chunks = []
    s = 0
    while s < bt:
        z = min(base, bt - s)
        chunks.append((s, z))
        s += z
    if len(chunks) < 2:
        return None
    return tuple(chunks)


def _gcfn_pipe_kernel_masked(
    x_ref, xb_ref, mask_ref, maskb_ref, lns_ref, lnb_ref, win_ref, bin_ref,
    wdw_ref, bdw_ref, wout_ref, bout_ref, ls_ref, out_ref, *, eps: float,
    hidden: int, bt: int, nt: int, chunks,
):
    _gcfn_pipe_core(x_ref, xb_ref, mask_ref, maskb_ref, lns_ref, lnb_ref,
                    win_ref, bin_ref, wdw_ref, bdw_ref, wout_ref, bout_ref,
                    ls_ref, out_ref, eps=eps, hidden=hidden, bt=bt, nt=nt,
                    chunks=chunks)


def _gcfn_pipe_kernel(
    x_ref, xb_ref, lns_ref, lnb_ref, win_ref, bin_ref,
    wdw_ref, bdw_ref, wout_ref, bout_ref, ls_ref, out_ref, *, eps: float,
    hidden: int, bt: int, nt: int, chunks,
):
    _gcfn_pipe_core(x_ref, xb_ref, None, None, lns_ref, lnb_ref,
                    win_ref, bin_ref, wdw_ref, bdw_ref, wout_ref, bout_ref,
                    ls_ref, out_ref, eps=eps, hidden=hidden, bt=bt, nt=nt,
                    chunks=chunks)


def _gcfn_pipe_core(
    x_ref, xb_ref, mask_ref, maskb_ref, lns_ref, lnb_ref, win_ref, bin_ref,
    wdw_ref, bdw_ref, wout_ref, bout_ref, ls_ref, out_ref, *, eps: float,
    hidden: int, bt: int, nt: int, chunks,
):
    """Software-pipelined GCFN block: the time-block is processed in
    sub-chunks with a one-stage lookahead.  Each sub-chunk's LN + up-
    projection computes its own ±1-row u halo, so the depthwise k3 of
    chunk j depends only on u already produced one iteration earlier —
    the loop issues chunk j+1's MXU dot before chunk j's VPU dw3/GLU
    chain, and Mosaic can overlap the two units instead of serializing
    them (the measured 2×-over-floor gap of the single-shot kernel).
    Redundancy cost: 2 extra projected rows per chunk (~1.6% at 128).
    """
    bi = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)            # [BT, F]
    xb = xb_ref[0, 0].astype(jnp.float32)       # [2, F]
    xa = jnp.concatenate([xb[0:1], x, xb[1:2]], axis=0)  # [BT+2, F]
    not_first = (bi > 0).astype(jnp.float32)
    not_last = (bi < nt - 1).astype(jnp.float32)
    am = None
    if mask_ref is not None:
        maskb = maskb_ref[0, 0]                 # [2, 1]
        am = jnp.concatenate(
            [maskb[0:1] * not_first, mask_ref[0], maskb[1:2] * not_last],
            axis=0,
        )                                       # [BT+2, 1]
    half = hidden // 2
    lns = lns_ref[0]
    lnb = lnb_ref[0]
    w0 = wdw_ref[0]
    w1 = wdw_ref[1]
    w2 = wdw_ref[2]
    nck = len(chunks)

    def ln_proj(j):
        s, z = chunks[j]
        xs = xa[s:s + z + 2]
        mean = jnp.mean(xs, axis=1, keepdims=True)
        c = xs - mean
        var = jnp.mean(c * c, axis=1, keepdims=True)
        xn = (c * jax.lax.rsqrt(var + eps)) * lns + lnb
        u = jnp.dot(xn.astype(win_ref.dtype), win_ref[:],
                    preferred_element_type=jnp.float32) + bin_ref[0]
        if am is not None:
            u = u * am[s:s + z + 2]
        else:
            # sequence-edge u rows contribute zeros (torch zero-pads
            # u-space); only the outermost halo rows are affected
            if j == 0:
                u = jnp.concatenate([u[0:1] * not_first, u[1:]], axis=0)
            if j == nck - 1:
                u = jnp.concatenate([u[:-1], u[-1:] * not_last], axis=0)
        return u

    u_cur = ln_proj(0)
    for j in range(nck):
        u_nxt = ln_proj(j + 1) if j + 1 < nck else None
        s, z = chunks[j]
        y = (u_cur[0:z] * w0 + u_cur[1:z + 1] * w1 + u_cur[2:z + 2] * w2
             + bdw_ref[0])
        g = y[:, :half] * jax.nn.sigmoid(y[:, half:])
        o = jnp.dot(g.astype(wout_ref.dtype), wout_ref[:],
                    preferred_element_type=jnp.float32) + bout_ref[0]
        out_ref[0, s:s + z] = (x[s:s + z] + ls_ref[0] * o).astype(out_ref.dtype)
        u_cur = u_nxt


def _gcfn_kernel_masked(
    x_ref, xb_ref, mask_ref, maskb_ref, lns_ref, lnb_ref, win_ref, bin_ref,
    wdw_ref, bdw_ref, wout_ref, bout_ref, ls_ref, out_ref, *, eps: float,
    hidden: int, bt: int, nt: int,
):
    _gcfn_core(x_ref, xb_ref, mask_ref, maskb_ref, lns_ref, lnb_ref,
               win_ref, bin_ref, wdw_ref, bdw_ref, wout_ref, bout_ref,
               ls_ref, out_ref, eps=eps, hidden=hidden, bt=bt, nt=nt)


def _gcfn_kernel(
    x_ref, xb_ref, lns_ref, lnb_ref, win_ref, bin_ref,
    wdw_ref, bdw_ref, wout_ref, bout_ref, ls_ref, out_ref, *, eps: float,
    hidden: int, bt: int, nt: int,
):
    _gcfn_core(x_ref, xb_ref, None, None, lns_ref, lnb_ref,
               win_ref, bin_ref, wdw_ref, bdw_ref, wout_ref, bout_ref,
               ls_ref, out_ref, eps=eps, hidden=hidden, bt=bt, nt=nt)


def _gcfn_core(
    x_ref, xb_ref, mask_ref, maskb_ref, lns_ref, lnb_ref, win_ref, bin_ref,
    wdw_ref, bdw_ref, wout_ref, bout_ref, ls_ref, out_ref, *, eps: float,
    hidden: int, bt: int, nt: int,
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
    # masked exact-eval (mask_ref not None): u-rows beyond each row's true
    # length are zeroed so the k3 conv at the last valid frame reads a
    # zero — exactly the XLA masked path's post-proj_in mask (GCFN in
    # models/blocks.py).  The unmasked variant compiles without the mask
    # inputs, keeping the hot eval path byte-identical.
    u_main = u[:bt] if mask_ref is None else u[:bt] * mask_ref[0]
    # sequence-edge boundaries contribute zeros (torch zero-pads u-space)
    not_first = (bi > 0).astype(jnp.float32)
    not_last = (bi < nt - 1).astype(jnp.float32)
    if mask_ref is not None:
        maskb = maskb_ref[0, 0]                 # [2, 1]
        not_first = not_first * maskb[0:1]
        not_last = not_last * maskb[1:2]
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


def gcfn_reference(x, params, eps: float, mask=None):
    """XLA reference with identical math (used for tests and the vjp).
    ``mask`` [B, T, 1] 0/1 zeroes u-rows beyond each row's true length
    (masked exact-eval; see GCFN in models/blocks.py)."""
    lns, lnb, win, bin_, wdw, bdw, wout, bout, ls = params
    mean = jnp.mean(x, axis=-1, keepdims=True)
    c = x - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    xn = c * jax.lax.rsqrt(var + eps) * lns + lnb
    u = jnp.einsum("btf,fh->bth", xn, win) + bin_
    if mask is not None:
        u = u * mask
    up = jnp.pad(u, ((0, 0), (1, 1), (0, 0)))
    t = x.shape[1]
    y = (up[:, :t] * wdw[0] + up[:, 1:t + 1] * wdw[1]
         + up[:, 2:t + 2] * wdw[2] + bdw)
    half = y.shape[-1] // 2
    g = y[..., :half] * jax.nn.sigmoid(y[..., half:])
    return x + ls * (jnp.einsum("bth,hf->btf", g, wout) + bout)


@functools.partial(jax.jit,
                   static_argnames=("eps", "interpret", "mxu", "pipe"))
def _fused_gcfn_impl(x, params, eps: float, interpret: bool = False,
                     mask=None, mxu: str = "auto", pipe: str = "auto"):
    lns, lnb, win, bin_, wdw, bdw, wout, bout, ls = params
    b, t, f = x.shape
    hidden = win.shape[1]
    chunks = None
    if pipe != "off":
        bt = pick_block_pipe(t)
        chunks = pipe_chunks(bt) if bt else None
    if chunks is None:
        bt = pick_block(t)
    if bt == 0:
        return gcfn_reference(x, params, eps, mask)
    nt = t // bt
    # the kernel's dots run in the weights' dtype (xn/g are cast to match
    # in-kernel), f32 accumulation either way — see resolve_mxu
    mm = resolve_mxu(mxu, x.dtype, interpret)
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

    full = lambda shape: pl.BlockSpec(shape, lambda bb, ii: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, bt, f), lambda bb, ii: (bb, ii, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 2, f), lambda bb, ii: (bb, ii, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, xb]
    if mask is not None:
        # per-row u-mask [B, T, 1] + its block-halo rows [B, nT, 2, 1]
        mask = mask.astype(jnp.float32)
        mp = jnp.pad(mask, ((0, 0), (1, 1), (0, 0)))
        maskb = jnp.stack(
            [jnp.take(mp, np.asarray(idx_prev), axis=1),
             jnp.take(mp, np.asarray(idx_next), axis=1)],
            axis=2,
        )
        in_specs += [
            pl.BlockSpec((1, bt, 1), lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, 1), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [mask, maskb]
    in_specs += [
        full((1, f)), full((1, f)),
        full((f, hidden)), full((1, hidden)),
        full((3, hidden)), full((1, hidden)),
        full((hidden // 2, f)), full((1, f)),
        full((1, f)),
    ]
    operands += [row2d(lns), row2d(lnb), win, row2d(bin_), wdw, row2d(bdw),
                 wout, row2d(bout), row2d(ls)]
    if chunks is not None:
        kernel = functools.partial(
            _gcfn_pipe_kernel if mask is None else _gcfn_pipe_kernel_masked,
            eps=eps, hidden=hidden, bt=bt, nt=nt, chunks=chunks,
        )
    else:
        kernel = functools.partial(
            _gcfn_kernel if mask is None else _gcfn_kernel_masked,
            eps=eps, hidden=hidden, bt=bt, nt=nt,
        )
    out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bt, f), lambda bb, ii: (bb, ii, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, f), x.dtype),
        interpret=interpret,
    )(*operands)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 5, 6))
def fused_gcfn(x, params, eps: float, interpret: bool = False, mask=None,
               mxu: str = "auto", pipe: str = "auto"):
    """Fused GCFN with XLA-reference gradients (recompute).  ``mask``
    [B, T, 1] 0/1 (optional) zeroes post-proj_in rows beyond each row's
    true length — masked exact-eval.  ``mxu`` selects the in-kernel MXU
    operand dtype for f32 streams (resolve_mxu); ``pipe`` "off" forces
    the single-shot kernel (A/B vs the software-pipelined one)."""
    return _fused_gcfn_impl(x, params, eps, interpret, mask=mask, mxu=mxu,
                            pipe=pipe)


def _fwd(x, params, eps, interpret, mask=None, mxu="auto", pipe="auto"):
    return _fused_gcfn_impl(x, params, eps, interpret, mask=mask, mxu=mxu,
                            pipe=pipe), (x, params, mask)


def _bwd(eps, interpret, mxu, pipe, res, g):
    x, params, mask = res
    _, vjp = jax.vjp(lambda x, p: gcfn_reference(x, p, eps, mask), x, params)
    mask_ct = None if mask is None else jnp.zeros_like(mask)
    return vjp(g) + (mask_ct,)


fused_gcfn.defvjp(_fwd, _bwd)
