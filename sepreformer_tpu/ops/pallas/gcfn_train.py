"""Fused GCFN with in-kernel dropout + handwritten backward (Pallas/TPU).

Training can't use the inference-path fused GCFN (ops/pallas/gcfn.py):
its two dropout sites (after GLU and after the down-projection,
network.py:55-58) need per-element randomness, and a recompute-based
backward would need the identical masks.  Solution: **stateless hash
dropout** — the keep mask is a pure function of (seed, site, global row,
channel), so the forward kernel, the backward kernel, and the pure-jnp
reference all regenerate identical masks with zero storage and no
cross-block coupling.

The backward kernel recomputes the forward internals per block (flops are
cheap, HBM is not), produces dx, and accumulates all parameter gradients
in VMEM across the sequential grid.  The depthwise-conv backward needs dy
at block edges; those rows are recomputed from 4 boundary x rows and 2
boundary dout rows passed alongside (hash masks regenerate anywhere).

HBM traffic per fwd+bwd: x and dout read ~twice, dx written once — versus
the XLA path's many 6F-wide round trips.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sepreformer_tpu.ops.pallas.gcfn import (
    MAX_BLOCK,
    MIN_BLOCK,
    matmul_dtype,
    pick_block,
    pipe_chunks,
)

# the backward kernel peaks at ~6.6 live [bt, hidden] f32 arrays (measured:
# bt=400 @ hidden=1536 hit 16.25M against the 16M scoped-vmem limit on
# v5e); budget rows so wide variants (Large: hidden=1536) fit
TRAIN_VMEM_BUDGET = 14 * 1024 * 1024
TRAIN_LIVE_ROWS = 7


def pick_train_block(t: int, hidden: int) -> int:
    """Time-block size for the train kernels: like pick_block but capped
    by the VMEM budget at the given hidden width (0 if nothing fits)."""
    cap = TRAIN_VMEM_BUDGET // (hidden * 4 * TRAIN_LIVE_ROWS)
    cap = min(MAX_BLOCK, cap // 8 * 8)
    if cap <= 0:
        return 0
    if t <= cap:
        return t
    for bt in range(cap, MIN_BLOCK - 1, -8):
        if t % bt == 0:
            return bt
    return 0


def keep_mask(seed, site: int, rows, cols, p: float):
    """Deterministic keep mask: uint32 avalanche hash of
    (seed, site, row, col) thresholded at p.  ``rows``/``cols`` are
    broadcastable int32 arrays of global indices; identical results in
    kernel and jnp reference."""
    r = rows.astype(jnp.uint32)
    c = cols.astype(jnp.uint32)
    s = (seed.astype(jnp.uint32)
         + jnp.uint32(site) * jnp.uint32(0x27D4EB2F))
    h = (r * jnp.uint32(0x9E3779B1)) ^ (c * jnp.uint32(0x85EBCA77)) ^ s
    h = h ^ (h >> jnp.uint32(15))
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> jnp.uint32(12))
    h = h * jnp.uint32(0x297A2D39)
    h = h ^ (h >> jnp.uint32(15))
    threshold = jnp.uint32(int(p * float(1 << 24)))
    return ((h >> jnp.uint32(8)) >= threshold).astype(jnp.float32)


def _ln_rows(x, lns, lnb, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    c = x - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xh = c * inv
    return xh * lns + lnb, xh, inv


def gcfn_train_reference(x, params, eps: float, seed, p: float):
    """Pure-jnp reference with the identical hash dropout (for tests and
    numerical comparison; the kernels must match it exactly)."""
    lns, lnb, win, bin_, wdw, bdw, wout, bout, ls = params
    b, t, f = x.shape
    hidden = win.shape[1]
    half = hidden // 2
    xn, _, _ = _ln_rows(x, lns, lnb, eps)
    u = jnp.einsum("btf,fh->bth", xn, win) + bin_
    up = jnp.pad(u, ((0, 0), (1, 1), (0, 0)))
    y = (up[:, :t] * wdw[0] + up[:, 1:t + 1] * wdw[1]
         + up[:, 2:t + 2] * wdw[2] + bdw)
    g0 = y[..., :half] * jax.nn.sigmoid(y[..., half:])
    rows = (jnp.arange(b, dtype=jnp.int32)[:, None, None] * t
            + jnp.arange(t, dtype=jnp.int32)[None, :, None])
    m0 = keep_mask(seed, 0, rows, jnp.arange(half, dtype=jnp.int32), p)
    g = g0 * m0 / (1.0 - p)
    o0 = jnp.einsum("bth,hf->btf", g, wout) + bout
    m1 = keep_mask(seed, 1, rows, jnp.arange(f, dtype=jnp.int32), p)
    o = o0 * m1 / (1.0 - p)
    return x + ls * o


def _rows_cols(b, bi, t, bt, n_rows, width):
    """Global (row, col) index grids for a block (rows offset by -1 when
    ``n_rows`` includes a leading boundary row)."""
    row0 = b * t + bi * bt
    rows = (jax.lax.broadcasted_iota(jnp.int32, (n_rows, width), 0) + row0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_rows, width), 1)
    return rows, cols


def _fwd_train_kernel(
    seed_ref, x_ref, xb_ref, lns_ref, lnb_ref, win_ref, bin_ref, wdw_ref,
    bdw_ref, wout_ref, bout_ref, ls_ref, out_ref,
    *, eps: float, hidden: int, bt: int, nt: int, t: int, p: float,
):
    b = pl.program_id(0)
    bi = pl.program_id(1)
    seed = seed_ref[0, 0]
    half = hidden // 2
    x = x_ref[0].astype(jnp.float32)
    xb = xb_ref[0, 0].astype(jnp.float32)
    both = jnp.concatenate([x, xb], axis=0)
    xn, _, _ = _ln_rows(both, lns_ref[0], lnb_ref[0], eps)
    # weights arrive pre-cast (bf16 for bf16 streams) -> native MXU mode
    u = jnp.dot(xn.astype(win_ref.dtype), win_ref[:],
                preferred_element_type=jnp.float32) + bin_ref[0]
    u_main = u[:bt]
    not_first = (bi > 0).astype(jnp.float32)
    not_last = (bi < nt - 1).astype(jnp.float32)
    u_prev = jnp.concatenate([u[bt:bt + 1] * not_first, u_main[:-1]], axis=0)
    u_next = jnp.concatenate([u_main[1:], u[bt + 1:bt + 2] * not_last], axis=0)
    y = u_prev * wdw_ref[0] + u_main * wdw_ref[1] + u_next * wdw_ref[2]
    y = y + bdw_ref[0]
    g0 = y[:, :half] * jax.nn.sigmoid(y[:, half:])
    rows, cols = _rows_cols(b, bi, t, bt, bt, half)
    g = g0 * keep_mask(seed, 0, rows, cols, p) / (1.0 - p)
    o0 = jnp.dot(g.astype(wout_ref.dtype), wout_ref[:],
                 preferred_element_type=jnp.float32)
    o0 = o0 + bout_ref[0]
    rows_f, cols_f = _rows_cols(b, bi, t, bt, bt, o0.shape[1])
    o = o0 * keep_mask(seed, 1, rows_f, cols_f, p) / (1.0 - p)
    out_ref[0] = (x + ls_ref[0] * o).astype(out_ref.dtype)


def _fwd_train_pipe_kernel(
    seed_ref, x_ref, xb_ref, lns_ref, lnb_ref, win_ref, bin_ref, wdw_ref,
    bdw_ref, wout_ref, bout_ref, ls_ref, out_ref,
    *, eps: float, hidden: int, bt: int, nt: int, t: int, p: float, chunks,
):
    """Software-pipelined train forward: sub-chunks with a one-stage
    lookahead so chunk j+1's up-projection MXU dot overlaps chunk j's
    VPU dw3/GLU/dropout chain (same structure as gcfn._gcfn_pipe_core,
    plus the two stateless-hash dropout sites)."""
    b = pl.program_id(0)
    bi = pl.program_id(1)
    seed = seed_ref[0, 0]
    half = hidden // 2
    keep_scale = 1.0 / (1.0 - p)
    x = x_ref[0].astype(jnp.float32)            # [BT, F]
    xb = xb_ref[0, 0].astype(jnp.float32)       # [2, F]
    xa = jnp.concatenate([xb[0:1], x, xb[1:2]], axis=0)  # [BT+2, F]
    not_first = (bi > 0).astype(jnp.float32)
    not_last = (bi < nt - 1).astype(jnp.float32)
    lns = lns_ref[0]
    lnb = lnb_ref[0]
    w0 = wdw_ref[0]
    w1 = wdw_ref[1]
    w2 = wdw_ref[2]
    nck = len(chunks)
    row0 = b * t + bi * bt

    def ln_proj(j):
        s, z = chunks[j]
        xs = xa[s:s + z + 2]
        mean = jnp.mean(xs, axis=1, keepdims=True)
        c = xs - mean
        var = jnp.mean(c * c, axis=1, keepdims=True)
        xn = (c * jax.lax.rsqrt(var + eps)) * lns + lnb
        u = jnp.dot(xn.astype(win_ref.dtype), win_ref[:],
                    preferred_element_type=jnp.float32) + bin_ref[0]
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
        g0 = y[:, :half] * jax.nn.sigmoid(y[:, half:])
        rows = (jax.lax.broadcasted_iota(jnp.int32, (z, half), 0)
                + (row0 + s))
        cols = jax.lax.broadcasted_iota(jnp.int32, (z, half), 1)
        g = g0 * keep_mask(seed, 0, rows, cols, p) * keep_scale
        o0 = jnp.dot(g.astype(wout_ref.dtype), wout_ref[:],
                     preferred_element_type=jnp.float32) + bout_ref[0]
        f_dim = o0.shape[1]
        rows_f = (jax.lax.broadcasted_iota(jnp.int32, (z, f_dim), 0)
                  + (row0 + s))
        cols_f = jax.lax.broadcasted_iota(jnp.int32, (z, f_dim), 1)
        o = o0 * keep_mask(seed, 1, rows_f, cols_f, p) * keep_scale
        out_ref[0, s:s + z] = (x[s:s + z] + ls_ref[0] * o).astype(out_ref.dtype)
        u_cur = u_nxt


def _bwd_train_pipe_kernel(
    seed_ref, x_ref, xb4_ref, dout_ref, doutb_ref,
    lns_ref, lnb_ref, win_ref, bin_ref, wdw_ref, bdw_ref, wout_ref,
    bout_ref, ls_ref,
    dx_ref, dlns_ref, dlnb_ref, dwin_ref, dbin_ref, dwdw_ref, dbdw_ref,
    dwout_ref, dbout_ref, dls_ref,
    *, eps: float, hidden: int, bt: int, nt: int, t: int, p: float, chunks,
):
    """Software-pipelined train backward.

    Each sub-chunk recomputes its own u halo (±2 rows) and dy halo
    (±1 row) from the chunk's LN+projection, which both removes the
    single-shot kernel's special-cased ``edge_dy`` rows and gives the
    one-stage lookahead: chunk j+1's up-projection dot is issued before
    chunk j's VPU-heavy backward chain (glu fwd+bwd, hash masks, du,
    LN backward), so the MXU and VPU overlap.  Param grads accumulate
    into the output refs (VMEM-resident across the sequential grid).
    """
    b = pl.program_id(0)
    bi = pl.program_id(1)
    step = b * nt + bi
    seed = seed_ref[0, 0]
    half = hidden // 2
    keep_scale = 1.0 / (1.0 - p)

    @pl.when(step == 0)
    def _init():
        dlns_ref[:] = jnp.zeros_like(dlns_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)
        dwin_ref[:] = jnp.zeros_like(dwin_ref)
        dbin_ref[:] = jnp.zeros_like(dbin_ref)
        dwdw_ref[:] = jnp.zeros_like(dwdw_ref)
        dbdw_ref[:] = jnp.zeros_like(dbdw_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        dbout_ref[:] = jnp.zeros_like(dbout_ref)
        dls_ref[:] = jnp.zeros_like(dls_ref)

    lns = lns_ref[0]
    lnb = lnb_ref[0]
    win = win_ref[:]
    w0 = wdw_ref[0]
    w1 = wdw_ref[1]
    w2 = wdw_ref[2]
    wout = wout_ref[:]
    ls = ls_ref[0]
    mm = wout.dtype
    not_first = (bi > 0).astype(jnp.float32)
    not_last = (bi < nt - 1).astype(jnp.float32)

    x = x_ref[0].astype(jnp.float32)                  # [BT, F]
    xb4 = xb4_ref[0, 0].astype(jnp.float32)           # rows -2,-1,BT,BT+1
    # xa4 row k holds LN-input row k-2 (block-relative)
    xa4 = jnp.concatenate([xb4[0:2], x, xb4[2:4]], axis=0)  # [BT+4, F]
    dout = dout_ref[0].astype(jnp.float32)            # [BT, F]
    doutb = doutb_ref[0, 0].astype(jnp.float32)       # rows -1, BT
    # da row k holds dout row k-1 (block-relative)
    da = jnp.concatenate([doutb[0:1], dout, doutb[1:2]], axis=0)
    f_dim = x.shape[1]
    nck = len(chunks)
    row0 = b * t + bi * bt

    def ln_proj(j):
        # u rows [s-2, s+z+2) plus the LN stats of the main rows
        s, z = chunks[j]
        xs = xa4[s:s + z + 4]
        mean = jnp.mean(xs, axis=1, keepdims=True)
        c = xs - mean
        var = jnp.mean(c * c, axis=1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        xh = c * inv
        xn = xh * lns + lnb
        u = jnp.dot(xn.astype(win.dtype), win,
                    preferred_element_type=jnp.float32) + bin_ref[0]
        # sequence-edge u rows are zeros (torch zero-pads u-space)
        if j == 0:
            u = jnp.concatenate([u[0:2] * not_first, u[2:]], axis=0)
        if j == nck - 1:
            u = jnp.concatenate([u[:-2], u[-2:] * not_last], axis=0)
        return u, xn, xh, inv

    cur = ln_proj(0)
    for j in range(nck):
        nxt = ln_proj(j + 1) if j + 1 < nck else None
        s, z = chunks[j]
        u_c, xn_c, xh_c, inv_c = cur        # u_c[i] = u row s-2+i, [z+4, H]
        # ---- forward recompute: y/g over rows [s-1, s+z) + halo row s+z
        y_c = (u_c[0:z + 2] * w0 + u_c[1:z + 3] * w1 + u_c[2:z + 4] * w2
               + bdw_ref[0])                # y_c[i] = y row s-1+i, [z+2, 6F]
        g0_c = y_c[:, :half] * jax.nn.sigmoid(y_c[:, half:])
        rows_h = (jax.lax.broadcasted_iota(jnp.int32, (z + 2, half), 0)
                  + (row0 + s - 1))
        cols_h = jax.lax.broadcasted_iota(jnp.int32, (z + 2, half), 1)
        m0 = keep_mask(seed, 0, rows_h, cols_h, p)
        g_c = g0_c * m0 * keep_scale
        # ---- backward
        rows_f = (jax.lax.broadcasted_iota(jnp.int32, (z + 2, f_dim), 0)
                  + (row0 + s - 1))
        cols_f = jax.lax.broadcasted_iota(jnp.int32, (z + 2, f_dim), 1)
        m1 = keep_mask(seed, 1, rows_f, cols_f, p)
        do0_c = da[s:s + z + 2] * ls * m1 * keep_scale  # rows s-1..s+z
        dg = jax.lax.dot_general(
            do0_c.astype(mm), wout, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dg0 = dg * m0 * keep_scale
        dy_c = _glu_bwd(dg0, y_c, half)     # dy_c[i] = dy row s-1+i
        # dy at the conv pad rows (global -1 / T) does not exist — zero it
        if j == 0:
            dy_c = jnp.concatenate([dy_c[0:1] * not_first, dy_c[1:]], axis=0)
        if j == nck - 1:
            dy_c = jnp.concatenate([dy_c[:-1], dy_c[-1:] * not_last], axis=0)
        dy_main = dy_c[1:z + 1]
        # fwd out rows (main only) for dls; one more MXU dot
        o0 = jnp.dot(g_c[1:z + 1].astype(mm), wout,
                     preferred_element_type=jnp.float32) + bout_ref[0]
        o = o0 * m1[1:z + 1] * keep_scale
        dls_ref[:] += jnp.sum(dout[s:s + z] * o, axis=0, keepdims=True)
        do0_main = do0_c[1:z + 1]
        dbout_ref[:] += jnp.sum(do0_main, axis=0, keepdims=True)
        dwout_ref[:] += jax.lax.dot_general(
            g_c[1:z + 1].astype(mm), do0_main.astype(mm),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dbdw_ref[:] += jnp.sum(dy_main, axis=0, keepdims=True)
        # conv weight grads over main rows: dwdw[tap] = sum dy[r]*u[r+tap-1]
        dwdw_ref[0:1, :] += jnp.sum(dy_main * u_c[1:z + 1], axis=0,
                                    keepdims=True)
        dwdw_ref[1:2, :] += jnp.sum(dy_main * u_c[2:z + 2], axis=0,
                                    keepdims=True)
        dwdw_ref[2:3, :] += jnp.sum(dy_main * u_c[3:z + 3], axis=0,
                                    keepdims=True)
        # conv input grad: du[r] = dy[r+1]*w0 + dy[r]*w1 + dy[r-1]*w2
        du = dy_c[2:z + 2] * w0 + dy_c[1:z + 1] * w1 + dy_c[0:z] * w2
        dbin_ref[:] += jnp.sum(du, axis=0, keepdims=True)
        xn_main = xn_c[2:z + 2]
        dwin_ref[:] += jax.lax.dot_general(
            xn_main.astype(mm), du.astype(mm), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dxn = jax.lax.dot_general(
            du.astype(mm), win, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xh_main = xh_c[2:z + 2]
        dlns_ref[:] += jnp.sum(dxn * xh_main, axis=0, keepdims=True)
        dlnb_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)
        dxh = dxn * lns
        mean_dxh = jnp.mean(dxh, axis=1, keepdims=True)
        mean_dxh_xh = jnp.mean(dxh * xh_main, axis=1, keepdims=True)
        dx_ln = (dxh - mean_dxh - xh_main * mean_dxh_xh) * inv_c[2:z + 2]
        dx_ref[0, s:s + z] = (dout[s:s + z] + dx_ln).astype(dx_ref.dtype)
        cur = nxt


def _recompute_rows(x_rows, row_ids, lns, lnb, win, bin_, eps):
    """LN + up-projection for arbitrary rows (boundary recompute)."""
    xn, xh, inv = _ln_rows(x_rows, lns, lnb, eps)
    u = jnp.dot(xn.astype(win.dtype), win,
                preferred_element_type=jnp.float32) + bin_
    return u, xn, xh, inv


def _glu_bwd(dg0, y, half):
    a = y[:, :half]
    bsig = jax.nn.sigmoid(y[:, half:])
    da = dg0 * bsig
    db = dg0 * a * bsig * (1.0 - bsig)
    return jnp.concatenate([da, db], axis=1)


def _bwd_train_kernel(
    seed_ref, x_ref, xb4_ref, dout_ref, doutb_ref,
    lns_ref, lnb_ref, win_ref, bin_ref, wdw_ref, bdw_ref, wout_ref,
    bout_ref, ls_ref,
    dx_ref, dlns_ref, dlnb_ref, dwin_ref, dbin_ref, dwdw_ref, dbdw_ref,
    dwout_ref, dbout_ref, dls_ref,
    *, eps: float, hidden: int, bt: int, nt: int, t: int, p: float,
):
    b = pl.program_id(0)
    bi = pl.program_id(1)
    step = b * nt + bi
    seed = seed_ref[0, 0]
    half = hidden // 2
    keep_scale = 1.0 / (1.0 - p)

    @pl.when(step == 0)
    def _init():
        dlns_ref[:] = jnp.zeros_like(dlns_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)
        dwin_ref[:] = jnp.zeros_like(dwin_ref)
        dbin_ref[:] = jnp.zeros_like(dbin_ref)
        dwdw_ref[:] = jnp.zeros_like(dwdw_ref)
        dbdw_ref[:] = jnp.zeros_like(dbdw_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        dbout_ref[:] = jnp.zeros_like(dbout_ref)
        dls_ref[:] = jnp.zeros_like(dls_ref)

    lns = lns_ref[0]
    lnb = lnb_ref[0]
    win = win_ref[:]
    bin_ = bin_ref[0]
    w0 = wdw_ref[0]
    w1 = wdw_ref[1]
    w2 = wdw_ref[2]
    wout = wout_ref[:]
    ls = ls_ref[0]
    not_first = (bi > 0).astype(jnp.float32)
    not_last = (bi < nt - 1).astype(jnp.float32)

    # ---- forward recompute ------------------------------------------------
    x = x_ref[0].astype(jnp.float32)                  # [BT, F]
    xb4 = xb4_ref[0, 0].astype(jnp.float32)           # rows t0-2,t0-1,t0+BT,t0+BT+1
    both = jnp.concatenate([x, xb4], axis=0)          # [BT+4, F]
    u_all, xn_all, xh_all, inv_all = _recompute_rows(
        both, None, lns, lnb, win, bin_, eps
    )
    u = u_all[:bt]
    xn = xn_all[:bt]
    xh = xh_all[:bt]
    inv = inv_all[:bt]
    u_m2 = u_all[bt:bt + 1] * not_first   # u[t0-2]
    u_m1 = u_all[bt + 1:bt + 2] * not_first
    u_p0 = u_all[bt + 2:bt + 3] * not_last  # u[t0+BT]
    u_p1 = u_all[bt + 3:bt + 4] * not_last

    u_prev = jnp.concatenate([u_m1, u[:-1]], axis=0)
    u_next = jnp.concatenate([u[1:], u_p0], axis=0)
    y = u_prev * w0 + u * w1 + u_next * w2 + bdw_ref[0]
    g0 = y[:, :half] * jax.nn.sigmoid(y[:, half:])
    rows_h, cols_h = _rows_cols(b, bi, t, bt, bt, half)
    m0 = keep_mask(seed, 0, rows_h, cols_h, p)
    g = g0 * m0 * keep_scale
    o0 = jnp.dot(g.astype(wout.dtype), wout,
                 preferred_element_type=jnp.float32) + bout_ref[0]
    f_dim = o0.shape[1]
    rows_f, cols_f = _rows_cols(b, bi, t, bt, bt, f_dim)
    m1 = keep_mask(seed, 1, rows_f, cols_f, p)
    o = o0 * m1 * keep_scale

    # ---- backward ---------------------------------------------------------
    dout = dout_ref[0].astype(jnp.float32)            # [BT, F]
    dls_ref[:] += jnp.sum(dout * o, axis=0, keepdims=True)
    do0 = dout * ls * m1 * keep_scale
    dbout_ref[:] += jnp.sum(do0, axis=0, keepdims=True)
    mm = wout.dtype  # bf16 multiplies / f32 accumulation for bf16 streams
    dwout_ref[:] += jax.lax.dot_general(
        g.astype(mm), do0.astype(mm), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dg = jax.lax.dot_general(
        do0.astype(mm), wout, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dg0 = dg * m0 * keep_scale
    dy = _glu_bwd(dg0, y, half)                       # [BT, 6F]
    dbdw_ref[:] += jnp.sum(dy, axis=0, keepdims=True)

    # boundary dy rows (t0-1 and t0+BT) for the conv backward
    def edge_dy(u_a, u_b, u_c, dout_row, row_id):
        y_e = u_a * w0 + u_b * w1 + u_c * w2 + bdw_ref[0]
        g0_e = y_e[:, :half] * jax.nn.sigmoid(y_e[:, half:])
        cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, f_dim), 1)
        colsh = jax.lax.broadcasted_iota(jnp.int32, (1, half), 1)
        rid = jnp.full((1, 1), row_id, jnp.int32)
        m1_e = keep_mask(seed, 1, rid, cols1, p)
        m0_e = keep_mask(seed, 0, rid, colsh, p)
        do0_e = dout_row * ls * m1_e * keep_scale
        dg_e = jax.lax.dot_general(
            do0_e.astype(wout.dtype), wout, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return _glu_bwd(dg_e * m0_e * keep_scale, y_e, half)

    doutb = doutb_ref[0, 0].astype(jnp.float32)       # [2, F]: rows t0-1, t0+BT
    row0 = b * t + bi * bt
    dy_m1 = edge_dy(u_m2, u_m1, u[0:1], doutb[0:1], row0 - 1) * not_first
    dy_p0 = edge_dy(u[bt - 1:bt], u_p0, u_p1, doutb[1:2], row0 + bt) * not_last

    dy_prev = jnp.concatenate([dy_m1, dy[:-1]], axis=0)   # dy[t-1]
    dy_next = jnp.concatenate([dy[1:], dy_p0], axis=0)    # dy[t+1]
    du = dy_next * w0 + dy * w1 + dy_prev * w2
    # conv weight grads: dwdw[tap] = sum_t dy[t] * u[t + tap - 1]
    dwdw_ref[0:1, :] += jnp.sum(dy * u_prev, axis=0, keepdims=True)
    dwdw_ref[1:2, :] += jnp.sum(dy * u, axis=0, keepdims=True)
    dwdw_ref[2:3, :] += jnp.sum(dy * u_next, axis=0, keepdims=True)

    dbin_ref[:] += jnp.sum(du, axis=0, keepdims=True)
    dwin_ref[:] += jax.lax.dot_general(
        xn.astype(mm), du.astype(mm), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dxn = jax.lax.dot_general(
        du.astype(mm), win, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dlns_ref[:] += jnp.sum(dxn * xh, axis=0, keepdims=True)
    dlnb_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)
    dxh = dxn * lns
    mean_dxh = jnp.mean(dxh, axis=1, keepdims=True)
    mean_dxh_xh = jnp.mean(dxh * xh, axis=1, keepdims=True)
    dx_ln = (dxh - mean_dxh - xh * mean_dxh_xh) * inv
    dx_ref[0] = (dout + dx_ln).astype(dx_ref.dtype)


def _specs(f, hidden, bt, nt):
    def full(shape):
        return pl.BlockSpec(shape, lambda bb, ii: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    seed = pl.BlockSpec((1, 1), lambda bb, ii: (0, 0),
                        memory_space=pltpu.SMEM)
    xblk = pl.BlockSpec((1, bt, f), lambda bb, ii: (bb, ii, 0),
                        memory_space=pltpu.VMEM)
    return full, seed, xblk


def _boundary_rows(x, bt, offsets):
    """Gather rows t0+off for each block (zero rows outside [0, T))."""
    b, t, f = x.shape
    nt = t // bt
    pad = max(-min(offsets), max(offsets) - t + 1, 0) + 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    idx = np.arange(nt)[:, None] * bt + np.asarray(offsets)[None, :] + pad
    return jnp.take(xp, np.asarray(idx, np.int32), axis=1)


@functools.partial(jax.jit,
                   static_argnames=("eps", "p", "interpret", "pipe"))
def _fwd_train_impl(x, params, seed, eps: float, p: float,
                    interpret: bool = False, pipe: str = "auto"):
    lns, lnb, win, bin_, wdw, bdw, wout, bout, ls = params
    b, t, f = x.shape
    hidden = win.shape[1]
    bt = pick_train_block(t, hidden)
    assert bt > 0, "unsupported length for fused train GCFN"
    nt = t // bt
    mm = matmul_dtype(x.dtype)
    win = win.astype(mm)
    wout = wout.astype(mm)
    xb = _boundary_rows(x, bt, (-1, bt))
    full, seed_spec, xblk = _specs(f, hidden, bt, nt)

    def row2d(a):
        return a.reshape(1, -1)

    chunks = pipe_chunks(bt) if pipe != "off" else None
    if chunks is not None:
        kernel = functools.partial(
            _fwd_train_pipe_kernel, eps=eps, hidden=hidden, bt=bt, nt=nt,
            t=t, p=p, chunks=chunks,
        )
    else:
        kernel = functools.partial(
            _fwd_train_kernel, eps=eps, hidden=hidden, bt=bt, nt=nt, t=t, p=p
        )
    return pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            seed_spec, xblk,
            pl.BlockSpec((1, 1, 2, f), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            full((1, f)), full((1, f)), full((f, hidden)), full((1, hidden)),
            full((3, hidden)), full((1, hidden)), full((hidden // 2, f)),
            full((1, f)), full((1, f)),
        ],
        out_specs=xblk,
        out_shape=jax.ShapeDtypeStruct((b, t, f), x.dtype),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1, 1), x, xb,
        row2d(lns), row2d(lnb), win, row2d(bin_), wdw, row2d(bdw),
        wout, row2d(bout), row2d(ls),
    )


@functools.partial(jax.jit,
                   static_argnames=("eps", "p", "interpret", "pipe"))
def _bwd_train_impl(x, params, seed, dout, eps: float, p: float,
                    interpret: bool = False, pipe: str = "auto"):
    lns, lnb, win, bin_, wdw, bdw, wout, bout, ls = params
    b, t, f = x.shape
    hidden = win.shape[1]
    bt = pick_train_block(t, hidden)
    nt = t // bt
    mm = matmul_dtype(x.dtype)
    win = win.astype(mm)
    wout = wout.astype(mm)
    xb4 = _boundary_rows(x, bt, (-2, -1, bt, bt + 1))
    doutb = _boundary_rows(dout, bt, (-1, bt))
    full, seed_spec, xblk = _specs(f, hidden, bt, nt)

    def row2d(a):
        return a.reshape(1, -1)

    chunks = pipe_chunks(bt) if pipe != "off" else None
    if chunks is not None:
        kernel = functools.partial(
            _bwd_train_pipe_kernel, eps=eps, hidden=hidden, bt=bt, nt=nt,
            t=t, p=p, chunks=chunks,
        )
    else:
        kernel = functools.partial(
            _bwd_train_kernel, eps=eps, hidden=hidden, bt=bt, nt=nt, t=t, p=p
        )
    outs = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            seed_spec, xblk,
            pl.BlockSpec((1, 1, 4, f), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            xblk,
            pl.BlockSpec((1, 1, 2, f), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            full((1, f)), full((1, f)), full((f, hidden)), full((1, hidden)),
            full((3, hidden)), full((1, hidden)), full((hidden // 2, f)),
            full((1, f)), full((1, f)),
        ],
        out_specs=[
            xblk,
            full((1, f)), full((1, f)), full((f, hidden)), full((1, hidden)),
            full((3, hidden)), full((1, hidden)), full((hidden // 2, f)),
            full((1, f)), full((1, f)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, f), x.dtype),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((3, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden // 2, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1, 1), x, xb4, dout, doutb,
        row2d(lns), row2d(lnb), win, row2d(bin_), wdw, row2d(bdw),
        wout, row2d(bout), row2d(ls),
    )
    dx, dlns, dlnb, dwin, dbin, dwdw, dbdw, dwout, dbout, dls = outs
    dparams = (
        dlns[0], dlnb[0], dwin, dbin[0], dwdw, dbdw[0], dwout, dbout[0],
        dls[0],
    )
    return dx, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_gcfn_train(x, params, seed, eps: float, p: float,
                     interpret: bool = False, pipe: str = "off"):
    """GCFN with hash dropout: fused forward + fused backward.

    ``pipe`` selects the sub-chunked software-pipelined kernels ("auto")
    vs the single-shot ones ("off").  Default is "off": MEASURED
    (MEASURE_TRAIN_LEVERS.json, v5e, solo) the pipelined TRAIN pair is
    3.2% slower end-to-end (133.9 vs 129.8 ms full Base step) — the
    per-chunk halo recompute (+4 projected rows and a second LN per
    chunk in the backward) costs more than the MXU/VPU overlap buys.
    The EVAL kernel keeps pipelining (gcfn.py, where it wins 3.6%)."""
    return _fwd_train_impl(x, params, seed, eps, p, interpret, pipe)


def _vjp_fwd(x, params, seed, eps, p, interpret, pipe="auto"):
    return _fwd_train_impl(x, params, seed, eps, p, interpret, pipe), (
        x, params, seed,
    )


def _vjp_bwd(eps, p, interpret, pipe, res, g):
    x, params, seed = res
    dx, dparams = _bwd_train_impl(x, params, seed, g, eps, p, interpret, pipe)
    dparams = tuple(dp.astype(pp.dtype) for dp, pp in zip(dparams, params))
    return dx, dparams, None


fused_gcfn_train.defvjp(_vjp_fwd, _vjp_bwd)
