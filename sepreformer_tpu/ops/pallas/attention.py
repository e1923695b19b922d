"""Fused flash attention with additive relative-position bias (Pallas/TPU).

The EGA global attention (modules/network.py:106-113 in the reference)
computes ``softmax((QK^T + Q pe[i-j]^T) / sqrt(d)) V`` at the bottleneck
length.  XLA materializes the [B, H, L, L] score tensor (plus the gathered
[L, L, d] pos table) in HBM; this kernel keeps everything in VMEM with an
online softmax, and computes the rel-pos bias *inside* the kernel:

- the embedding table is pre-gathered once into ``pe_pad`` [2*Lp, D] rows
  covering rel = -Lp..Lp-1 with the reference's clamp to [-maxlen,
  maxlen-1] baked in (module.py:53-54);
- for a block pair (bi, bj) the needed rel values form a contiguous row
  range of ``pe_pad`` → one dynamic slice + one [BL, D] x [D, 2BL] matmul
  gives S2[ii, r] = q_ii . pe[rel_r];
- the banded extraction bias[ii, jj] = S2[ii, BL + ii - jj] is done with a
  log2(BL)-step barrel shifter (roll + select), which Mosaic lowers to
  cheap lane shifts — no gathers.

HBM traffic per layer: q, k, v, out once each — no L^2 intermediates.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
NEG_INF = -1.0e30


def _barrel_extract(s2r: jnp.ndarray, block: int) -> jnp.ndarray:
    """band[ii, jj] = s2r[ii, jj + (block-1-ii)] for s2r [block, 2*block].

    ``s2r`` is the q x pe product against the ROW-REVERSED pe table (the
    reversal is baked into ``pe_pad`` outside the kernel — Mosaic has no
    `rev` lowering), so the band is a per-row circular LEFT shift by
    (block-1-ii), composed from power-of-two rolls selected by the bits of
    the shift amount (barrel shifter; no gathers).
    """
    n = 2 * block
    x = s2r
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, n), 0)
    shift = (block - 1) - rows  # left-shift per row, in [0, block-1]
    bits = int(math.log2(block))
    for bit in range(bits):
        amount = 1 << bit
        # left-shift by `amount` == circular roll right by n - amount
        rolled = pltpu.roll(x, n - amount, axis=1)
        apply = ((shift >> bit) & 1) == 1
        x = jnp.where(apply, rolled, x)
    return x[:, :block]


def pick_block(l: int) -> int:
    """Single full-length block (power of two for the barrel shifter) when
    the whole [L, L] score tile fits VMEM comfortably: at the EGA
    bottleneck length (~500) the 128-row grid's per-program overhead
    dominated the kernel, so one [512, 512] program per (b, h) amortizes
    it.  (Even so, XLA still wins the full model at L=500 — 23.4 vs
    ~29 ms fwd on v5e — so `auto` keeps the 1024 switch-over; this helps
    the forced-pallas path and mid-length eval buckets.)  Longer
    sequences keep the 128-row online-softmax pipeline."""
    if l <= 512:
        return max(128, 1 << math.ceil(math.log2(l)))
    return BLOCK


def _flash_kernel(
    lens_ref, q_ref, k_ref, v_ref, pe_ref,
    out_ref,
    acc_ref, m_ref, l_ref,
    *, sm_scale: float, length: int, nb: int, block: int, h: int,
):
    bi = pl.program_id(1)
    bj = pl.program_id(2)

    @pl.when(bj == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # dots run in the stream dtype (bf16 multiplies on the MXU for bf16
    # inputs) with f32 accumulation; softmax state stays f32
    q = q_ref[0]                               # [BL, D]
    k = k_ref[0]                               # [BL, D]
    v = v_ref[0]                               # [BL, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                          # [BL, BL]

    # rel-pos bias: contiguous slice of the ROW-REVERSED pe table; see
    # _build_pe_pad.  band[ii,jj] = q_ii . pe[rel=(bi-bj)*BL + ii - jj]
    # lands at reversed-table offset (nb-1-bi+bj)*BL + (BL-1-ii+jj).
    off = (nb - 1 - bi + bj) * block
    pe_slice = pe_ref[pl.ds(off, 2 * block), :].astype(q.dtype)
    s2 = jax.lax.dot_general(
        q, pe_slice, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # [BL, 2BL]
    s = s + _barrel_extract(s2, block)
    s = s * sm_scale

    # mask key padding: block padding (global j >= length) AND the
    # utterance's true length (j >= lens[b], masked batched eval — the
    # same key-validity span as the XLA masked path in
    # MultiHeadAttention; network.py:106-113 is the bias math)
    limit = jnp.minimum(length, lens_ref[pl.program_id(0) // h, 0])
    col = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1) + bj * block
    s = jnp.where(col < limit, s, NEG_INF)

    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)  # [BL, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(bj == nb - 1)
    def _finalize():
        out_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            out_ref.dtype
        )


def _build_pe_pad(pe_table: jnp.ndarray, lp: int, maxlen: int) -> jnp.ndarray:
    """Row-REVERSED clamped table: row r holds pe[clip(lp-1-r, +-maxlen)].

    Forward order would be rel = r - lp for r in [0, 2*lp); the kernel
    needs the reversed slice and Mosaic has no `rev`, so rows are stored
    reversed: rel = lp - 1 - r.
    """
    rel = lp - 1 - np.arange(2 * lp)
    idx = np.clip(rel, -maxlen, maxlen - 1) + maxlen
    return jnp.take(pe_table, np.asarray(idx, np.int32), axis=0)


@functools.partial(jax.jit, static_argnames=("maxlen", "interpret", "block"))
def _flash_relpos_attention_impl(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, pe_table: jnp.ndarray,
    maxlen: int, interpret: bool = False, block: Optional[int] = None,
    lens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    b, h, l, d = q.shape
    block = pick_block(l) if block is None else block
    sm_scale = 1.0 / math.sqrt(d)
    nb = pl.cdiv(l, block)
    lp = nb * block
    pad = lp - l

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x.reshape(b * h, lp, d)

    qp, kp, vp = prep(q), prep(k), prep(v)
    pe_pad = _build_pe_pad(pe_table, lp, maxlen)
    if lens is None:
        lens2d = jnp.full((b, 1), l, jnp.int32)
    else:
        lens2d = lens.astype(jnp.int32).reshape(b, 1)

    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, length=l, nb=nb, block=block, h=h
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * h, nb, nb),
        in_specs=[
            # full [B, 1] lens vector in SMEM for every program (block
            # dims must equal array dims for sub-(8,128) blocks)
            pl.BlockSpec((b, 1), lambda bh, bi, bj: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block, d), lambda bh, bi, bj: (bh, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, d), lambda bh, bi, bj: (bh, bj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, d), lambda bh, bi, bj: (bh, bj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * lp, d), lambda bh, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, d), lambda bh, bi, bj: (bh, bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lp, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block, d), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
        ],
        interpret=interpret,
    )(lens2d, qp, kp, vp, pe_pad)
    return out.reshape(b, h, lp, d)[:, :, :l]


def relpos_attention_reference(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, pe_table: jnp.ndarray,
    maxlen: int, lens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """XLA reference: materialized scores + gathered pos table
    (numerically identical semantics to network.py:106-121).  With
    ``lens`` [B], keys at j >= lens[b] get -inf before the softmax —
    the masked exact-eval span."""
    b, h, l, d = q.shape
    pos = np.arange(l)
    rel = np.clip(pos[:, None] - pos[None, :], -maxlen, maxlen - 1) + maxlen
    pos_k = jnp.take(pe_table, np.asarray(rel, np.int32), axis=0)
    scores = jnp.einsum("bhid,bhjd->bhij", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores + jnp.einsum("bhid,ijd->bhij", q,
                                 pos_k.astype(q.dtype),
                                 preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(d)
    if lens is not None:
        kmask = jnp.arange(l, dtype=jnp.int32)[None] < lens[:, None]
        scores = jnp.where(kmask[:, None, None, :], scores, NEG_INF)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v,
                      preferred_element_type=q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_relpos_attention(q, k, v, pe_table, maxlen, interpret=False,
                           lens=None):
    """Fused attention; gradients fall back to the XLA reference
    (recompute) so the kernel needs no hand-written backward.
    ``lens`` [B] int32 (optional) masks keys beyond each row's true
    length (masked batched eval / padded long utterances)."""
    return _flash_relpos_attention_impl(q, k, v, pe_table, maxlen, interpret,
                                        lens=lens)


def _fwd(q, k, v, pe_table, maxlen, interpret, lens=None):
    out = _flash_relpos_attention_impl(q, k, v, pe_table, maxlen, interpret,
                                       lens=lens)
    return out, (q, k, v, pe_table, lens)


def _bwd(maxlen, interpret, residuals, g):
    q, k, v, pe_table, lens = residuals
    _, vjp = jax.vjp(
        lambda q, k, v, pe: relpos_attention_reference(q, k, v, pe, maxlen,
                                                       lens),
        q, k, v, pe_table,
    )
    lens_ct = (None if lens is None
               else np.zeros(lens.shape, jax.dtypes.float0))
    return vjp(g) + (lens_ct,)


flash_relpos_attention.defvjp(_fwd, _bwd)
