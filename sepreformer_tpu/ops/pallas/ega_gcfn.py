"""Fused EGA-tail + GCFN kernel: gate -> residual -> GCFN in one
VMEM-resident pass (inference/eval path).

A GlobalBlock is ``EGA`` then ``GCFN`` (modules/network.py:189-209).  The
EGA tail — ``x + sigmoid(Linear(LN(x))) * nearest_up(attn_out)``
(network.py:126-155) — is pure elementwise + one [F, F] matmul, but under
XLA it costs several full-resolution HBM round-trips (gate LN+proj write,
the multiply-add fusion, and the GCFN re-reading its input), measured at
~2 ms/step across the 22 global blocks of SepReformer-B.  This kernel
computes the tail on the GCFN's input block while it is already resident
in VMEM and feeds straight into the GCFN chain (same math as
ops/pallas/gcfn.py, see that file for the boundary-row scheme).

The nearest upsample of the attention output stays in XLA (it fuses into
the attention epilogue as one broadcast write); the upsampled tensor is
streamed into the kernel as a second blocked input.  An earlier in-kernel
formulation (one-hot selection matmul over the full coarse tensor) was
profile-rejected: at [8, 8000, 128] the [402, 500] x [500, 128] selection
dots cost more than every HBM round-trip they saved (2.84 ms vs 1.32 ms
for the plain fused GCFN).  Gradients fall back to the XLA reference via
custom_vjp (recompute).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sepreformer_tpu.ops.pallas.gcfn import (
    gcfn_reference,
    matmul_dtype,
    pick_block,
)


def _kernel(
    x_ref, up_ref, xb_ref, upb_ref,
    gns_ref, gnb_ref, wg_ref, bg_ref,
    lns_ref, lnb_ref, win_ref, bin_ref, wdw_ref, bdw_ref,
    wout_ref, bout_ref, ls_ref,
    out_ref,
    *, eps: float, hidden: int, bt: int, nt: int,
):
    bi = pl.program_id(1)

    def layer_norm(v, scale, bias):
        mean = jnp.mean(v, axis=1, keepdims=True)
        c = v - mean
        var = jnp.mean(c * c, axis=1, keepdims=True)
        return c * jax.lax.rsqrt(var + eps) * scale + bias

    x = x_ref[0].astype(jnp.float32)              # [bt, F]
    xb = xb_ref[0, 0].astype(jnp.float32)         # [2, F] boundary rows
    xall = jnp.concatenate([x, xb], axis=0)       # [bt+2, F]

    # ---- EGA tail: gate + residual --------------------------------------
    gn = layer_norm(xall, gns_ref[0], gnb_ref[0])
    gate = jax.nn.sigmoid(
        jnp.dot(gn.astype(wg_ref.dtype), wg_ref[:],
                preferred_element_type=jnp.float32) + bg_ref[0]
    )
    up = jnp.concatenate(
        [up_ref[0].astype(jnp.float32), upb_ref[0, 0].astype(jnp.float32)],
        axis=0,
    )                                             # [bt+2, F]
    y = xall + gate * up

    # ---- GCFN chain on y (math identical to gcfn.py::_gcfn_kernel) ------
    xn = layer_norm(y, lns_ref[0], lnb_ref[0])
    u = jnp.dot(xn.astype(win_ref.dtype), win_ref[:],
                preferred_element_type=jnp.float32)
    u = u + bin_ref[0]
    u_main = u[:bt]
    not_first = (bi > 0).astype(jnp.float32)
    not_last = (bi < nt - 1).astype(jnp.float32)
    u_prev = jnp.concatenate([u[bt:bt + 1] * not_first, u_main[:-1]], axis=0)
    u_next = jnp.concatenate([u_main[1:], u[bt + 1:bt + 2] * not_last], axis=0)
    z = u_prev * wdw_ref[0] + u_main * wdw_ref[1] + u_next * wdw_ref[2]
    z = z + bdw_ref[0]
    half = hidden // 2
    g = z[:, :half] * jax.nn.sigmoid(z[:, half:])
    out = jnp.dot(g.astype(wout_ref.dtype), wout_ref[:],
                  preferred_element_type=jnp.float32)
    out = out + bout_ref[0]
    out_ref[0] = (y[:bt] + ls_ref[0] * out).astype(out_ref.dtype)


def ega_tail_gcfn_reference(x, x_down, gate_params, gcfn_params, eps: float):
    """XLA reference with identical math (tests + the vjp)."""
    from sepreformer_tpu.ops.resample import nearest_upsample_time

    gns, gnb, wg, bg = gate_params
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    gn = c * jax.lax.rsqrt(var + eps) * gns + gnb
    gate = jax.nn.sigmoid(jnp.einsum("btf,fo->bto", gn, wg) + bg)
    up = nearest_upsample_time(x_down.astype(jnp.float32), x.shape[1])
    y = (xf + gate * up).astype(x.dtype)
    return gcfn_reference(y, gcfn_params, eps)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _impl(x, x_down, gate_params, gcfn_params, eps: float,
          interpret: bool = False):
    from sepreformer_tpu.ops.resample import nearest_upsample_time

    gns, gnb, wg, bg = gate_params
    lns, lnb, win, bin_, wdw, bdw, wout, bout, ls = gcfn_params
    b, t, f = x.shape
    hidden = win.shape[1]
    bt = pick_block(t)
    if bt == 0:
        return ega_tail_gcfn_reference(x, x_down, gate_params, gcfn_params, eps)
    nt = t // bt
    mm = matmul_dtype(x.dtype)
    wg = wg.astype(mm)
    win = win.astype(mm)
    wout = wout.astype(mm)

    up = nearest_upsample_time(x_down, t).astype(x.dtype)

    # boundary rows per block (orig indices i0-1 and i0+bt); values at
    # sequence edges are garbage-safe: their GCFN u-rows are zero-masked
    # in-kernel, matching torch's zero-padded conv input
    idx_prev = np.arange(nt) * bt          # padded coords of orig i0-1
    idx_next = np.arange(nt) * bt + bt + 1  # padded coords of orig i0+bt

    def boundary(a):
        ap = jnp.pad(a, ((0, 0), (1, 1), (0, 0)))
        return jnp.stack(
            [jnp.take(ap, np.asarray(idx_prev), axis=1),
             jnp.take(ap, np.asarray(idx_next), axis=1)],
            axis=2,
        )                                  # [B, nT, 2, F]

    def row2d(a):
        return a.reshape(1, -1)

    kernel = functools.partial(
        _kernel, eps=eps, hidden=hidden, bt=bt, nt=nt
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda bb, ii: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    blocked = pl.BlockSpec((1, bt, f), lambda bb, ii: (bb, ii, 0),
                           memory_space=pltpu.VMEM)
    bnd = pl.BlockSpec((1, 1, 2, f), lambda bb, ii: (bb, ii, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            blocked, blocked, bnd, bnd,
            full((1, f)), full((1, f)),
            full((f, f)), full((1, f)),
            full((1, f)), full((1, f)),
            full((f, hidden)), full((1, hidden)),
            full((3, hidden)), full((1, hidden)),
            full((hidden // 2, f)), full((1, f)),
            full((1, f)),
        ],
        out_specs=blocked,
        out_shape=jax.ShapeDtypeStruct((b, t, f), x.dtype),
        interpret=interpret,
    )(
        x, up, boundary(x), boundary(up),
        row2d(gns), row2d(gnb), wg, row2d(bg),
        row2d(lns), row2d(lnb), win, row2d(bin_), wdw, row2d(bdw),
        wout, row2d(bout), row2d(ls),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_ega_tail_gcfn(x, x_down, gate_params, gcfn_params, eps: float,
                        interpret: bool = False):
    """Fused EGA tail + GCFN with XLA-reference gradients (recompute)."""
    return _impl(x, x_down, gate_params, gcfn_params, eps, interpret)


def _fwd(x, x_down, gate_params, gcfn_params, eps, interpret):
    return (
        _impl(x, x_down, gate_params, gcfn_params, eps, interpret),
        (x, x_down, gate_params, gcfn_params),
    )


def _bwd(eps, interpret, res, g):
    x, x_down, gate_params, gcfn_params = res
    _, vjp = jax.vjp(
        lambda x, xd, gp, cp: ega_tail_gcfn_reference(x, xd, gp, cp, eps),
        x, x_down, gate_params, gcfn_params,
    )
    return vjp(g)


fused_ega_tail_gcfn.defvjp(_fwd, _bwd)
