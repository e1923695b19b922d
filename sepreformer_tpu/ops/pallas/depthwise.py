"""Depthwise 1-D conv (large kernel) with custom backward — Pallas/TPU.

The CLA local block's k=65 'same' depthwise conv (network.py:165) is the
train-step's dominant cost under XLA: the grouped-conv lowering and its
transpose/grad convs measured ~9 ms per full-resolution block on v5e.

Design: the caller-side impl pads the signal and materializes overlapping
halo windows [B, nT, BT+k-1, C] with one XLA gather (~1.08x of one x read);
the kernel then needs only disjoint BlockSpecs, keeps a (BT+k-1, 128)
window in VMEM and runs the conv as a tap-loop of shifted multiply-adds.
The backward computes dx as the flipped-kernel conv of dy halo windows and
accumulates per-tap weight grads across the sequential grid.  HBM traffic:
one halo read + one write per pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHANNEL_BLOCK = 128
MAX_BT = 2048
MIN_BT = 256


def pick_time_block(t: int) -> int:
    """BT: t itself when small, else a multiple-of-8 divisor of t."""
    if t <= MAX_BT:
        return t
    for bt in range(MAX_BT, MIN_BT - 1, -8):
        if t % bt == 0:
            return bt
    return 0


def supports(t: int, c: int) -> bool:
    return c % CHANNEL_BLOCK == 0 and pick_time_block(t) > 0


def _halo_windows(x: jnp.ndarray, bt: int, halo: int) -> jnp.ndarray:
    """[B, T, C] -> [B, nT, BT + 2*halo, C] overlapping zero-padded windows."""
    b, t, c = x.shape
    nt = t // bt
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))
    idx = np.arange(nt)[:, None] * bt + np.arange(bt + 2 * halo)[None, :]
    return jnp.take(xp, np.asarray(idx, np.int32), axis=1)


def _fwd_kernel(xh_ref, w_ref, b_ref, out_ref, *, k: int, bt: int):
    # dynamic slices must go through the ref (Mosaic has no value-level
    # dynamic_slice lowering); VMEM re-reads per tap are cheap
    def tap_body(tap, acc):
        win = xh_ref[0, 0, pl.ds(tap, bt), :].astype(jnp.float32)
        return acc + win * w_ref[pl.ds(tap, 1), :]

    acc = jax.lax.fori_loop(
        0, k, tap_body, jnp.zeros((bt, CHANNEL_BLOCK), jnp.float32)
    )
    out_ref[0] = (acc + b_ref[0]).astype(out_ref.dtype)


def _bwd_w_kernel(xh_ref, dy_ref, dw_ref, db_ref, *, k: int, bt: int):
    """Weight/bias-grad-only tap loop (dx is computed outside as an XLA
    depthwise conv of dy with the flipped kernel, which rides the MXU
    conv lowering — see depthwise_large's vjp)."""
    step = pl.program_id(1) * pl.num_programs(2) + pl.program_id(2)
    dy = dy_ref[0].astype(jnp.float32)

    @pl.when(step == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    def tap_body(tap, _):
        # dw[tap] = sum_t x[t + tap - pad] * dy[t]
        xwin = xh_ref[0, 0, pl.ds(tap, bt), :].astype(jnp.float32)
        dw_ref[pl.ds(tap, 1), :] += jnp.sum(xwin * dy, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, k, tap_body, 0)
    db_ref[:] += jnp.sum(dy, axis=0, keepdims=True)


def _bwd_kernel(
    xh_ref, dyh_ref, dy_ref, w_ref, dx_ref, dw_ref, db_ref,
    *, k: int, bt: int,
):
    step = pl.program_id(1) * pl.num_programs(2) + pl.program_id(2)
    dy = dy_ref[0].astype(jnp.float32)

    @pl.when(step == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    def tap_body(tap, acc):
        # dx[t] = sum_tap w[tap] * dy[t + pad - tap]  (correlation)
        dwin = dyh_ref[0, 0, pl.ds(k - 1 - tap, bt), :].astype(jnp.float32)
        acc = acc + dwin * w_ref[pl.ds(tap, 1), :]
        # dw[tap] = sum_t x[t + tap - pad] * dy[t]
        xwin = xh_ref[0, 0, pl.ds(tap, bt), :].astype(jnp.float32)
        dw_ref[pl.ds(tap, 1), :] += jnp.sum(xwin * dy, axis=0, keepdims=True)
        return acc

    dx = jax.lax.fori_loop(
        0, k, tap_body, jnp.zeros((bt, CHANNEL_BLOCK), jnp.float32)
    )
    dx_ref[0] = dx.astype(dx_ref.dtype)
    db_ref[:] += jnp.sum(dy, axis=0, keepdims=True)


def _impl_fwd(x, w, b, interpret: bool = False):
    bsz, t, c = x.shape
    k = w.shape[0]
    halo = (k - 1) // 2
    bt = pick_time_block(t)
    nt = t // bt
    cb = c // CHANNEL_BLOCK
    xh = _halo_windows(x, bt, halo)
    kernel = functools.partial(_fwd_kernel, k=k, bt=bt)
    win = bt + 2 * halo
    return pl.pallas_call(
        kernel,
        grid=(cb, bsz, nt),
        in_specs=[
            pl.BlockSpec((1, 1, win, CHANNEL_BLOCK),
                         lambda ci, bi, ti: (bi, ti, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, CHANNEL_BLOCK), lambda ci, bi, ti: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHANNEL_BLOCK), lambda ci, bi, ti: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, CHANNEL_BLOCK),
                               lambda ci, bi, ti: (bi, ti, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t, c), x.dtype),
        interpret=interpret,
    )(xh, w, b.reshape(1, c))


def _impl_bwd(x, w, dy, interpret: bool = False):
    bsz, t, c = x.shape
    k = w.shape[0]
    halo = (k - 1) // 2
    bt = pick_time_block(t)
    nt = t // bt
    cb = c // CHANNEL_BLOCK
    xh = _halo_windows(x, bt, halo)
    dyh = _halo_windows(dy, bt, halo)
    kernel = functools.partial(_bwd_kernel, k=k, bt=bt)
    win = bt + 2 * halo
    dx, dw, db = pl.pallas_call(
        kernel,
        grid=(cb, bsz, nt),
        in_specs=[
            pl.BlockSpec((1, 1, win, CHANNEL_BLOCK),
                         lambda ci, bi, ti: (bi, ti, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, win, CHANNEL_BLOCK),
                         lambda ci, bi, ti: (bi, ti, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, CHANNEL_BLOCK),
                         lambda ci, bi, ti: (bi, ti, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, CHANNEL_BLOCK), lambda ci, bi, ti: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, CHANNEL_BLOCK),
                         lambda ci, bi, ti: (bi, ti, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, CHANNEL_BLOCK), lambda ci, bi, ti: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHANNEL_BLOCK), lambda ci, bi, ti: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, t, c), x.dtype),
            jax.ShapeDtypeStruct((k, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(xh, dyh, dy, w)
    return dx, dw, db.reshape(c)


def _impl_bwd_w(x, dy, k: int, interpret: bool = False):
    """dw/db only (tap-loop kernel); dx is handled by the caller."""
    bsz, t, c = x.shape
    halo = (k - 1) // 2
    bt = pick_time_block(t)
    nt = t // bt
    cb = c // CHANNEL_BLOCK
    xh = _halo_windows(x, bt, halo)
    kernel = functools.partial(_bwd_w_kernel, k=k, bt=bt)
    win = bt + 2 * halo
    dw, db = pl.pallas_call(
        kernel,
        grid=(cb, bsz, nt),
        in_specs=[
            pl.BlockSpec((1, 1, win, CHANNEL_BLOCK),
                         lambda ci, bi, ti: (bi, ti, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, CHANNEL_BLOCK),
                         lambda ci, bi, ti: (bi, ti, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, CHANNEL_BLOCK), lambda ci, bi, ti: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHANNEL_BLOCK), lambda ci, bi, ti: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(xh, dy)
    return dw, db.reshape(c)


def depthwise_reference(x, w, b):
    """XLA reference: 'same' depthwise conv, channels-last.  w: [k, C]."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w[:, None, :], window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
    ) + b


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def depthwise_large(x, w, b, interpret: bool = False):
    """Large-kernel 'same' depthwise conv: XLA forward (its conv forward
    lowering is fast — measured faster than the Pallas tap-loop forward on
    v5e), Pallas backward (XLA's conv *gradient* lowerings were the train
    step's dominant cost).  x: [B, T, C], w: [k, C], b: [C]; odd k."""
    return depthwise_reference(x, w, b)


def _vjp_fwd(x, w, b, interpret):
    return depthwise_reference(x, w, b), (x, w)


# "conv" computes dx as an XLA depthwise conv of dy with the flipped
# kernel and keeps only dw/db in the Pallas tap loop.  MEASURED AND
# REJECTED (MEASURE_TRAIN_LEVERS.json, v5e, solo): full Base train step
# 163.0 ms vs 129.8 ms with the fused tap loop — XLA's lowering for the
# standalone flipped-kernel grouped conv is nowhere near its fast
# in-graph forward lowering, and dx/dw as separate ops re-read dy/x from
# HBM.  "fused" (default) is the single-kernel dx+dw tap loop.
BWD_MODE = "fused"


def _vjp_bwd(interpret, res, g):
    x, w = res
    if BWD_MODE == "conv":
        c = x.shape[-1]
        # dx[t] = sum_tap w[tap] * dy[t + pad - tap] — a 'same' depthwise
        # conv of dy with the time-flipped kernel (k odd ⇒ symmetric pad);
        # XLA lowers this to the MXU near SoL (~210 µs at [4, 8000, 128])
        # where the tap-loop kernel runs 65 shifted VPU multiply-adds
        dx = jax.lax.conv_general_dilated(
            g, jnp.flip(w, 0).astype(g.dtype)[:, None, :],
            window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
            preferred_element_type=jnp.float32,
        )
        # the tap-loop kernel does unaligned sublane loads, which Mosaic
        # only allows on unpacked (32-bit) layouts — f32 in for bf16 streams
        dw, db = _impl_bwd_w(x.astype(jnp.float32), g.astype(jnp.float32),
                             w.shape[0], interpret)
    else:
        dx, dw, db = _impl_bwd(x.astype(jnp.float32), w.astype(jnp.float32),
                               g.astype(jnp.float32), interpret)
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(w.dtype)


depthwise_large.defvjp(_vjp_fwd, _vjp_bwd)
