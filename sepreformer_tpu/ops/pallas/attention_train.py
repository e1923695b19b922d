"""Flash rel-pos attention TRAIN path: hash dropout + handwritten backward.

Training previously ran global attention through XLA (the inference flash
kernel has no dropout and its vjp recomputes through the XLA reference),
which materializes many [B, H, L, L] tensors in HBM per block — the
[L, L]-shaped ops measured ~22% of the SepReformer-B train step on v5e
(profile_step.py, ~32 ms of 147 ms at batch 4; the realized end-to-end
win is smaller, see resolve_attention_train_impl).  EGA always attends
at the bottleneck length
(network.py:145-151 — L ≈ 500 for 4 s crops), so one [Lp, Lp] score tile
per (batch, head) fits VMEM whole: this module implements that
single-block case with

- the same in-kernel rel-pos bias as the inference kernel
  (ops/pallas/attention.py): contiguous slice of the row-reversed clamped
  pe table + barrel-shift band extraction;
- **stateless hash dropout** on the attention probabilities (same
  avalanche hash as the GCFN train kernel, ops/pallas/gcfn_train.py):
  mask = f(seed, global row, col), regenerated identically by the forward
  kernel, the backward kernel, and the jnp reference — no stored masks;
- a handwritten backward kernel that recomputes softmax in VMEM and emits
  dq, dk, dv and the pe-table gradient.  The band adjoint is the inverse
  barrel shift (scatter back into the [BL, 2BL] layout), and d(pe_pad) is
  accumulated across the sequential (b*h) grid in VMEM; the final
  scatter-add onto the [2*maxlen, d] embedding table is one cheap XLA
  index-add.

HBM traffic per layer fwd+bwd: q, k, v, dout read O(1) times and the
four gradients written once — no [L, L] intermediates.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sepreformer_tpu.ops.pallas.attention import (
    NEG_INF,
    _barrel_extract,
    _build_pe_pad,
    pick_block,
)
from sepreformer_tpu.ops.pallas.gcfn_train import keep_mask


def supported_length(l: int) -> bool:
    """This kernel handles the single-block case only (bottleneck-length
    training); longer sequences keep the XLA train path."""
    return l <= 512


def _barrel_scatter(band: jnp.ndarray, block: int) -> jnp.ndarray:
    """Adjoint of ``_barrel_extract``: place band[ii, jj] at
    s2r[ii, jj + (block-1-ii)] in a zero [block, 2*block] buffer (per-row
    circular RIGHT shift by block-1-ii; no wraparound since
    jj + shift < 2*block)."""
    n = 2 * block
    x = jnp.pad(band, ((0, 0), (0, n - block)))
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, n), 0)
    shift = (block - 1) - rows
    bits = int(math.log2(block))
    for bit in range(bits):
        amount = 1 << bit
        rolled = pltpu.roll(x, amount, axis=1)  # circular right shift
        apply = ((shift >> bit) & 1) == 1
        x = jnp.where(apply, rolled, x)
    return x


def _recompute_probs(q, k, pe, seed, bh, *, sm_scale, length, block, p_drop,
                     limit=None):
    """Shared fwd/bwd softmax + dropout recomputation (all in VMEM).

    Returns (P [BL, BL] f32, mask-scaled P for the V dot, keep/(1-p) scale
    tensor).  ``limit`` (traced scalar, optional) additionally masks keys
    at j >= limit — the per-utterance true length of masked batched eval.
    """
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s2 = jax.lax.dot_general(
        q, pe, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = (s + _barrel_extract(s2, block)) * sm_scale
    col = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    eff = length if limit is None else jnp.minimum(length, limit)
    s = jnp.where(col < eff, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    probs = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
    if p_drop > 0.0:
        rows = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
                + bh * block)
        scale = keep_mask(seed, 0, rows, col, p_drop) / (1.0 - p_drop)
    else:
        scale = jnp.ones_like(probs)
    return probs, probs * scale, scale


def _fwd_kernel(seed_ref, lens_ref, q_ref, k_ref, v_ref, pe_ref, out_ref, *,
                sm_scale, length, block, p_drop, h):
    bh = pl.program_id(0)
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    _, pd, _ = _recompute_probs(
        q, k, pe_ref[:].astype(q.dtype), seed_ref[0, 0], bh,
        sm_scale=sm_scale, length=length, block=block, p_drop=p_drop,
        limit=lens_ref[bh // h, 0],
    )
    out_ref[0] = jax.lax.dot_general(
        pd.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, lens_ref, q_ref, k_ref, v_ref, pe_ref, dout_ref,
                dq_ref, dk_ref, dv_ref, dpe_ref, *,
                sm_scale, length, block, p_drop, h):
    bh = pl.program_id(0)
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    pe = pe_ref[:].astype(q.dtype)
    dout = dout_ref[0]
    probs, pd, scale = _recompute_probs(
        q, k, pe, seed_ref[0, 0], bh,
        sm_scale=sm_scale, length=length, block=block, p_drop=p_drop,
        limit=lens_ref[bh // h, 0],
    )
    # dV = Pd^T dout
    dv_ref[0] = jax.lax.dot_general(
        pd.astype(dout.dtype), dout, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    # dPd = dout V^T ; dP = dPd * dropout scale
    dpd = jax.lax.dot_general(
        dout, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = dpd * scale
    # softmax backward on the scaled scores
    ds = probs * (dp - jnp.sum(dp * probs, axis=1, keepdims=True))
    ds = ds * sm_scale
    dsq = ds.astype(q.dtype)
    # dq = dS k + scatter(dS) pe   (band adjoint).  The scatter's rolls
    # run on the f32 ds: Mosaic's dynamic_rotate only supports 32-bit
    # lanes ("Rotate with non-32-bit data" on bf16).
    ds2 = _barrel_scatter(ds, block).astype(q.dtype)
    dq = jax.lax.dot_general(
        dsq, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        ds2, pe, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    # dk = dS^T q
    dk_ref[0] = jax.lax.dot_general(
        dsq, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)
    # d(pe_pad) += dS2^T q, accumulated across the sequential grid
    dpe = jax.lax.dot_general(
        ds2, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(bh == 0)
    def _init():
        dpe_ref[:] = dpe

    @pl.when(bh > 0)
    def _acc():
        dpe_ref[:] = dpe_ref[:] + dpe


def _specs(block, d, lp, b):
    seed = pl.BlockSpec((1, 1), lambda bh: (0, 0), memory_space=pltpu.SMEM)
    # full [B, 1] lens vector in SMEM for every program (block dims must
    # equal array dims for sub-(8,128) blocks); kernels index bh // h
    lens = pl.BlockSpec((b, 1), lambda bh: (0, 0), memory_space=pltpu.SMEM)
    per_bh = pl.BlockSpec((1, block, d), lambda bh: (bh, 0, 0),
                          memory_space=pltpu.VMEM)
    pe = pl.BlockSpec((2 * lp, d), lambda bh: (0, 0),
                      memory_space=pltpu.VMEM)
    return seed, lens, per_bh, pe


def _lens2d(lens, b, l):
    if lens is None:
        return jnp.full((b, 1), l, jnp.int32)
    return lens.astype(jnp.int32).reshape(b, 1)


def _prep(x, b, h, lp, l, d):
    pad = lp - l
    x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x.reshape(b * h, lp, d)


@functools.partial(
    jax.jit, static_argnames=("maxlen", "p_drop", "interpret")
)
def _fwd_impl(q, k, v, pe_table, seed, maxlen, p_drop, interpret, lens=None):
    b, h, l, d = q.shape
    block = pick_block(l)
    assert block >= l, "train kernel is single-block only (l <= 512)"
    lp = block
    qp, kp, vp = (_prep(x, b, h, lp, l, d) for x in (q, k, v))
    pe_pad = _build_pe_pad(pe_table, lp, maxlen)
    seed_spec, lens_spec, per_bh, pe_spec = _specs(block, d, lp, b)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=1.0 / math.sqrt(d),
                          length=l, block=block, p_drop=p_drop, h=h),
        grid=(b * h,),
        in_specs=[seed_spec, lens_spec, per_bh, per_bh, per_bh, pe_spec],
        out_specs=per_bh,
        out_shape=jax.ShapeDtypeStruct((b * h, lp, d), q.dtype),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1), _lens2d(lens, b, l),
      qp, kp, vp, pe_pad)
    return out.reshape(b, h, lp, d)[:, :, :l]


@functools.partial(
    jax.jit, static_argnames=("maxlen", "p_drop", "interpret")
)
def _bwd_impl(q, k, v, pe_table, seed, dout, maxlen, p_drop, interpret,
              lens=None):
    b, h, l, d = q.shape
    block = pick_block(l)
    lp = block
    qp, kp, vp = (_prep(x, b, h, lp, l, d) for x in (q, k, v))
    dp_ = _prep(dout.astype(q.dtype), b, h, lp, l, d)
    pe_pad = _build_pe_pad(pe_table, lp, maxlen)
    seed_spec, lens_spec, per_bh, pe_spec = _specs(block, d, lp, b)
    dq, dk, dv, dpe_pad = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=1.0 / math.sqrt(d),
                          length=l, block=block, p_drop=p_drop, h=h),
        grid=(b * h,),
        in_specs=[seed_spec, lens_spec, per_bh, per_bh, per_bh, pe_spec,
                  per_bh],
        out_specs=[per_bh, per_bh, per_bh,
                   pl.BlockSpec((2 * lp, d), lambda bh: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lp, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, lp, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, lp, d), q.dtype),
            jax.ShapeDtypeStruct((2 * lp, d), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1), _lens2d(lens, b, l),
      qp, kp, vp, pe_pad, dp_)

    def unprep(x):
        return x.reshape(b, h, lp, d)[:, :, :l]

    # pe_pad row r holds pe_table[idx[r]] (clamped, row-reversed); its
    # adjoint is one scatter-add onto the table
    rel = lp - 1 - np.arange(2 * lp)
    idx = np.clip(rel, -maxlen, maxlen - 1) + maxlen
    dtable = jnp.zeros(pe_table.shape, jnp.float32).at[
        np.asarray(idx, np.int32)
    ].add(dpe_pad)
    return (unprep(dq), unprep(dk), unprep(dv),
            dtable.astype(pe_table.dtype))


def attention_train_reference(q, k, v, pe_table, maxlen, seed, p_drop,
                              lens=None):
    """Pure-jnp reference with the identical hash dropout (padded to the
    kernel's block size so the mask indices line up exactly)."""
    b, h, l, d = q.shape
    block = pick_block(l)
    lp = block
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lp - l), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lp - l), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lp - l), (0, 0)))
    pos = np.arange(lp)
    rel = np.clip(pos[:, None] - pos[None, :], -maxlen, maxlen - 1) + maxlen
    pos_k = jnp.take(pe_table, np.asarray(rel, np.int32), axis=0)
    s = jnp.einsum("bhid,bhjd->bhij", qp, kp,
                   preferred_element_type=jnp.float32)
    s = s + jnp.einsum("bhid,ijd->bhij", qp, pos_k.astype(qp.dtype),
                       preferred_element_type=jnp.float32)
    s = s / math.sqrt(d)
    col = np.arange(lp)[None, None, None, :]
    kmask = (jnp.asarray(col) < l if lens is None
             else jnp.asarray(col) < jnp.minimum(
                 l, lens.astype(jnp.int32)).reshape(b, 1, 1, 1))
    s = jnp.where(kmask, s, NEG_INF)
    probs = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    if p_drop > 0.0:
        bh = jnp.arange(b * h, dtype=jnp.int32).reshape(b, h, 1, 1)
        rows = bh * lp + jnp.arange(lp, dtype=jnp.int32).reshape(1, 1, lp, 1)
        cols = jnp.arange(lp, dtype=jnp.int32).reshape(1, 1, 1, lp)
        probs = probs * keep_mask(seed, 0, rows, cols, p_drop) / (1.0 - p_drop)
    out = jnp.einsum("bhij,bhjd->bhid", probs.astype(qp.dtype), vp,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out[:, :, :l]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_relpos_attention_train(q, k, v, pe_table, seed,
                                 maxlen: int, p_drop: float,
                                 interpret: bool = False, lens=None):
    """Training attention: fused forward with hash dropout + fused
    backward (dq, dk, dv, d pe_table).  ``lens`` [B] int32 (optional)
    masks keys beyond each row's true length — used when this kernel's
    dropout-free forward serves masked batched eval
    (attention_impl="single")."""
    return _fwd_impl(q, k, v, pe_table, seed, maxlen, p_drop, interpret,
                     lens=lens)


def _vjp_fwd(q, k, v, pe_table, seed, maxlen, p_drop, interpret, lens=None):
    out = _fwd_impl(q, k, v, pe_table, seed, maxlen, p_drop, interpret,
                    lens=lens)
    return out, (q, k, v, pe_table, seed, lens)


def _vjp_bwd(maxlen, p_drop, interpret, res, g):
    q, k, v, pe_table, seed, lens = res
    dq, dk, dv, dpe = _bwd_impl(q, k, v, pe_table, seed, g, maxlen,
                                p_drop, interpret, lens=lens)
    lens_ct = (None if lens is None
               else np.zeros(lens.shape, jax.dtypes.float0))
    return dq, dk, dv, dpe, None, lens_ct


flash_relpos_attention_train.defvjp(_vjp_fwd, _vjp_bwd)
