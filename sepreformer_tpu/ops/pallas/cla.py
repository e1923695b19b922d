"""Fused CLA local block (inference): LN -> Linear(F->2F) -> GLU ->
depthwise k65 'same' -> Linear(F->2F) -> BatchNorm(affine, folded) ->
GELU -> Linear(2F->F) -> LayerScale residual, one VMEM-resident pass.

Why: under XLA the CLA chain is the forward's largest remaining cost
(~33% fusions + ~10% proj matmuls of the 21.4 ms v5e profile,
ARCHITECTURE.md).  The chain is HBM-bound: every full-resolution CLA
round-trips ~176 MB of [B, T, 2F] intermediates between its three matmuls
and the conv.  Fusing keeps them in VMEM: HBM traffic drops to one x read
+ one out write (+ halo overlap).

The k65 conv needs 32 halo rows per block edge.  The caller materializes
overlapping halo windows of the *input* ([B, nT, BT+64, F], one XLA
gather, same pattern as ops/pallas/depthwise.py); the kernel recomputes
LN+proj+GLU on the 64 extra rows — cheap — and zero-masks v-space rows
outside the sequence to match torch's zero padding of the conv input
(the conv input is the GLU output, network.py:163-165).

BatchNorm enters the kernel as a folded affine (s, t) precomputed from
running stats OUTSIDE the custom_vjp boundary, so gradients w.r.t.
gamma/beta still flow through the fold.  The kernel is therefore
eval-semantics only (use_running_average); training keeps the XLA path
(batch stats + dropout).

Behavioral reference: CLA (modules/network.py:159-187).  Gradients fall
back to the XLA reference via custom_vjp (recompute).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sepreformer_tpu.ops.pallas.gcfn import matmul_dtype

MAX_BLOCK = 512
MIN_BLOCK = 64


def pick_block(t: int, f: int) -> int:
    """Time-block size: t itself when it fits (Mosaic allows full-dim
    blocks of any size), else the largest multiple-of-8 divisor of t in
    [MIN_BLOCK, MAX_BLOCK]; 0 if none.  VMEM: live arrays per block are
    ~7*F*win f32 (window, v scratch, two 2F-wide intermediates) — both
    F=128 and F=256 fit comfortably at MAX_BLOCK."""
    if t <= MAX_BLOCK:
        return t
    for bt in range(MAX_BLOCK, MIN_BLOCK - 1, -8):
        if t % bt == 0:
            return bt
    return 0


def _halo_windows(x: jnp.ndarray, bt: int, halo: int) -> jnp.ndarray:
    """[B, T, F] -> [B, nT, BT + 2*halo, F] overlapping zero-padded windows."""
    b, t, f = x.shape
    nt = t // bt
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))
    idx = np.arange(nt)[:, None] * bt + np.arange(bt + 2 * halo)[None, :]
    return jnp.take(xp, np.asarray(idx, np.int32), axis=1)


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7, i.e. f32-level
    exact) — Mosaic has no erf/erfc lowering, exp lowers fine."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _cla_kernel(
    xh_ref, lns_ref, lnb_ref, win_ref, bin_ref, wdw_ref, bdw_ref,
    wmid_ref, bmid_ref, bns_ref, bnt_ref, wout_ref, bout_ref, ls_ref,
    out_ref, v_scratch,
    *, eps: float, k: int, bt: int, halo: int, t_total: int,
):
    ti = pl.program_id(1)
    win = bt + 2 * halo
    f = xh_ref.shape[-1]

    x = xh_ref[0, 0].astype(jnp.float32)                      # [win, F]
    # LN over all rows (halo rows recomputed; invalid rows masked below)
    mean = jnp.mean(x, axis=1, keepdims=True)
    c = x - mean
    var = jnp.mean(c * c, axis=1, keepdims=True)
    xn = c * jax.lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]
    u = jnp.dot(xn.astype(win_ref.dtype), win_ref[:],
                preferred_element_type=jnp.float32)
    u = u + bin_ref[0]                                        # [win, 2F]
    v = u[:, :f] * jax.nn.sigmoid(u[:, f:])                   # GLU -> [win, F]
    # zero rows outside the sequence: torch zero-pads the conv input
    # (= the GLU output), but LN/proj of a zero-padded x row is nonzero
    base = ti * bt - halo
    row = jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0) + base
    v = jnp.where((row >= 0) & (row < t_total), v, 0.0)
    v_scratch[:] = v

    def tap_body(tap, acc):
        vwin = v_scratch[pl.ds(tap, bt), :]
        return acc + vwin * wdw_ref[pl.ds(tap, 1), :]

    acc = jax.lax.fori_loop(0, k, tap_body, jnp.zeros((bt, f), jnp.float32))
    y = acc + bdw_ref[0]                                      # [bt, F]
    y = jnp.dot(y.astype(wmid_ref.dtype), wmid_ref[:],
                preferred_element_type=jnp.float32)
    y = y + bmid_ref[0]
    y = y * bns_ref[0] + bnt_ref[0]                           # folded BN
    # exact (erf) GELU, erf approximated in-kernel (see _erf)
    y = 0.5 * y * (1.0 + _erf(y * np.float32(1.0 / np.sqrt(2.0))))
    out = jnp.dot(y.astype(wout_ref.dtype), wout_ref[:],
                  preferred_element_type=jnp.float32)
    out = out + bout_ref[0]
    x_main = x[halo:halo + bt]
    out_ref[0] = (x_main + ls_ref[0] * out).astype(out_ref.dtype)


def cla_reference(x, params, eps: float):
    """XLA reference with identical math (tests + the recompute vjp).

    params: (lns, lnb, w_in [F,2F], b_in [2F], wdw [k,F], bdw [F],
    w_mid [F,2F], b_mid [2F], bn_s [2F], bn_t [2F], w_out [2F,F],
    b_out [F], ls [F]) — bn_s/bn_t are the running-stats BatchNorm folded
    to an affine: s = gamma*rsqrt(var+eps_bn), t = beta - mean*s.
    """
    (lns, lnb, w_in, b_in, wdw, bdw, w_mid, b_mid, bn_s, bn_t,
     w_out, b_out, ls) = params
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    xn = c * jax.lax.rsqrt(var + eps) * lns + lnb
    u = jnp.einsum("btf,fh->bth", xn, w_in) + b_in
    f = x.shape[-1]
    v = u[..., :f] * jax.nn.sigmoid(u[..., f:])
    y = jax.lax.conv_general_dilated(
        v, wdw[:, None, :], window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=f,
    ) + bdw
    y = jnp.einsum("btf,fh->bth", y, w_mid) + b_mid
    y = y * bn_s + bn_t
    y = jax.nn.gelu(y, approximate=False)
    out = jnp.einsum("bth,hf->btf", y, w_out) + b_out
    return (xf + ls * out).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _fused_cla_impl(x, params, eps: float, interpret: bool = False):
    (lns, lnb, w_in, b_in, wdw, bdw, w_mid, b_mid, bn_s, bn_t,
     w_out, b_out, ls) = params
    b, t, f = x.shape
    k = wdw.shape[0]
    halo = (k - 1) // 2
    bt = pick_block(t, f)
    if bt == 0:
        return cla_reference(x, params, eps)
    nt = t // bt
    mm = matmul_dtype(x.dtype)
    w_in = w_in.astype(mm)
    w_mid = w_mid.astype(mm)
    w_out = w_out.astype(mm)

    xh = _halo_windows(x, bt, halo)
    win = bt + 2 * halo

    def row2d(a):
        return a.reshape(1, -1)

    kernel = functools.partial(
        _cla_kernel, eps=eps, k=k, bt=bt, halo=halo, t_total=t
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda bb, ii: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, win, f), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            full((1, f)), full((1, f)),
            full((f, 2 * f)), full((1, 2 * f)),
            full((k, f)), full((1, f)),
            full((f, 2 * f)), full((1, 2 * f)),
            full((1, 2 * f)), full((1, 2 * f)),
            full((2 * f, f)), full((1, f)),
            full((1, f)),
        ],
        out_specs=pl.BlockSpec((1, bt, f), lambda bb, ii: (bb, ii, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, f), x.dtype),
        scratch_shapes=[pltpu.VMEM((win, f), jnp.float32)],
        interpret=interpret,
    )(
        xh, row2d(lns), row2d(lnb), w_in, row2d(b_in), wdw, row2d(bdw),
        w_mid, row2d(b_mid), row2d(bn_s), row2d(bn_t), w_out, row2d(b_out),
        row2d(ls),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_cla(x, params, eps: float, interpret: bool = False):
    """Fused CLA (eval semantics) with XLA-reference gradients (recompute)."""
    return _fused_cla_impl(x, params, eps, interpret)


def _fwd(x, params, eps, interpret):
    return _fused_cla_impl(x, params, eps, interpret), (x, params)


def _bwd(eps, interpret, res, g):
    x, params = res
    _, vjp = jax.vjp(lambda x, p: cla_reference(x, p, eps), x, params)
    return vjp(g)


fused_cla.defvjp(_fwd, _bwd)
