"""Fused masked-softmax·V eval kernel (the cheap half of flash attention).

Profiling the B=4 eval forward (v5e, round 4) showed the XLA attention
path is HBM-bound on its L² tensors: the scores tensor is written, read
by the softmax fusion, the probs tensor written, then read again by the
PV dot — plus a [L, L, H, B] layout copy per block (~113 us) between the
bias dot and the softmax fusion.  The *math* (QKᵀ dot, rel-pos bias dot,
softmax arithmetic) is near its bandwidth floor; the waste is traffic.

The earlier full in-VMEM attention kernel ("single", attention_train.py)
eliminates all L² traffic but pays a barrel-shift band extraction per
(batch, head) — measured to cost more than the traffic it saves at the
bottleneck length (PERF_CLOSE.json).  This kernel splits the difference:

- XLA computes scores = (QKᵀ + Q·pos_kt) / sqrt(d) — two MXU dots it
  already executes near speed-of-light, with the rel-pos bias coming
  from the layout-pinned Pallas pos_kt (ops/pallas/relpos.py);
- the kernel consumes scores ONCE from HBM (per-head DMA, double
  buffered) and does key-mask → softmax → ·V entirely in VMEM, writing
  the [B, L, F] output directly in the model's native channels-last
  layout (V enters native too — no head split/merge transposes, no d=16
  lane tiling anywhere: heads are statically unrolled so V/output use
  static lane slices of the 128-wide feature axis).

HBM traffic per block drops from ~4 L² traversals (scores w/r + probs
w/r) to 2 (scores w + r); the probs tensor and its layout copies never
exist.  Full-row softmax runs in f32 (reference semantics:
modules/network.py:114-121).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30

# full-row scratch budget: beyond this the kernel switches to key-blocked
# streaming with online softmax (removes the Lp=2048 VMEM ceiling that
# forced 16 s utterances onto the dense XLA path — VERDICT r4 item 4)
FULL_ROW_SCRATCH_BYTES = 10 * 1024 * 1024
KEY_BLOCK_SCRATCH_BYTES = 8 * 1024 * 1024


def pick_qk_blocks(lp: int, itemsize: int) -> tuple:
    """(LQ, KB) for the query+key-blocked kernel: largest 128-multiple
    divisors of lp with LQ <= 512 (keeps the per-row m/l/acc accumulators
    small — a [Lp, 1] f32 vector tile-expands to Lp/8 full (8, 128) tiles,
    1 MB at Lp=2048, which is what blew the 16 MB scoped-vmem limit in the
    first Lp-tall formulation) and the double-buffered [LQ, KB] scratch
    within budget.  (0, 0) if lp has no 128-multiple divisor."""

    def largest_divisor(limit: int) -> int:
        for cand in range(min(limit, lp), 127, -128):
            if lp % cand == 0:
                return cand
        return 0

    lq = largest_divisor(512)
    if lq == 0:
        return 0, 0
    kb_cap = (KEY_BLOCK_SCRATCH_BYTES // (2 * lq * itemsize)) // 128 * 128
    kb = largest_divisor(min(kb_cap, 1024))
    if kb == 0:
        return 0, 0
    return lq, kb


def _kernel(lens_ref, s_hbm, v_ref, out_ref, scratch, sems,
            *, length: int, lp: int, heads: int):
    b = pl.program_id(0)
    limit = jnp.minimum(length, lens_ref[b, 0])
    col = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
    kmask = col < limit
    d = v_ref.shape[-1] // heads

    def get_dma(slot, hh):
        return pltpu.make_async_copy(
            s_hbm.at[b, hh], scratch.at[slot], sems.at[slot]
        )

    get_dma(0, 0).start()
    for hh in range(heads):
        slot = hh % 2
        if hh + 1 < heads:
            get_dma((hh + 1) % 2, hh + 1).start()
        get_dma(slot, hh).wait()
        s = scratch[slot].astype(jnp.float32)
        s = jnp.where(kmask, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, :, hh * d:(hh + 1) * d]
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, :, hh * d:(hh + 1) * d] = (out / l).astype(out_ref.dtype)


def _kernel_kb(lens_ref, s_hbm, v_ref, out_ref, scratch, sems,
               *, length: int, lp: int, heads: int, lq: int, kb: int):
    """Query+key-blocked variant: for each LQ-row query block (grid dim),
    streams [LQ, KB] score tiles with online softmax (flash-style m/l/acc
    accumulators).  Scratch is 2·LQ·KB and the per-row accumulators are
    [LQ, 1] — both independent of Lp, which removes the Lp=2048 ceiling
    that forced 16 s utterances onto the dense XLA path.  (The first
    key-blocked attempt kept full-Lp rows: its [Lp, 1] m/l vectors each
    tile-expand to 1 MB at Lp=2048 and the kernel blew the 16 MB
    scoped-vmem limit at 19.7 MB — measured on v5e, r5.)  Math is the
    same full-row softmax, just accumulated key-blockwise in f32."""
    b = pl.program_id(0)
    qi = pl.program_id(1)
    limit = jnp.minimum(length, lens_ref[b, 0])
    d = v_ref.shape[-1] // heads
    nkb = lp // kb
    # column validity only depends on the key index: one [1, KB] row
    # broadcasts over the LQ query rows (a full [LQ, KB] iota was 4 MB
    # of the scoped-vmem blowup in the first attempt)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (1, kb), 1)

    def get_dma(slot, hh, j):
        return pltpu.make_async_copy(
            s_hbm.at[b, hh, pl.ds(qi * lq, lq), pl.ds(j * kb, kb)],
            scratch.at[slot], sems.at[slot],
        )

    get_dma(0, 0, 0).start()
    for hh in range(heads):

        def body(j, carry):
            m, l, acc = carry
            # slot parity follows the GLOBAL block counter hh*nkb + j, so
            # the cross-head prefetch lands in the slot the next head's
            # j=0 iteration actually waits on (plain rem(j, 2) broke for
            # odd nkb: head h+1 block 0 was prefetched into slot
            # rem(nkb, 2) = 1 but read from slot 0 — caught by the
            # multi-head interpret test at nkb=3)
            g = hh * nkb + j
            slot = jax.lax.rem(g, 2)

            @pl.when(j + 1 < nkb)
            def _():
                get_dma(jax.lax.rem(g + 1, 2), hh, j + 1).start()

            @pl.when(jnp.logical_and(j + 1 >= nkb, hh + 1 < heads))
            def _():
                get_dma(jax.lax.rem(g + 1, 2), hh + 1, 0).start()

            get_dma(slot, hh, j).wait()
            s = scratch[slot].astype(jnp.float32)
            s = jnp.where(col0 + j * kb < limit, s, NEG_INF)
            m_blk = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            corr = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            # keys of block j live in V rows [j*kb, (j+1)*kb)
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype),
                v_ref[0, pl.ds(j * kb, kb), hh * d:(hh + 1) * d],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (m_new,
                    l * corr + jnp.sum(p, axis=1, keepdims=True),
                    acc * corr + pv)

        m0 = jnp.full((lq, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((lq, 1), jnp.float32)
        a0 = jnp.zeros((lq, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nkb, body, (m0, l0, a0))
        out_ref[0, :, hh * d:(hh + 1) * d] = (acc / l).astype(out_ref.dtype)


def _kernel2(lens_ref, s_hbm, b_hbm, v_ref, out_ref, s_scr, b_scr,
             s_sems, b_sems, *, length: int, lp: int, heads: int):
    """Two-tensor variant: scores arrive as the UNSUMMED (QKᵀ, Q·pos_ktᵀ)
    dot outputs and are added in VMEM after the f32 upcast — the separate
    XLA add fusion (two L² reads + one L² write per block) never exists,
    and both dots write their MXU output dtype directly."""
    b = pl.program_id(0)
    limit = jnp.minimum(length, lens_ref[b, 0])
    col = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
    kmask = col < limit
    d = v_ref.shape[-1] // heads

    def get_s(slot, hh):
        return pltpu.make_async_copy(
            s_hbm.at[b, hh], s_scr.at[slot], s_sems.at[slot]
        )

    def get_b(slot, hh):
        return pltpu.make_async_copy(
            b_hbm.at[b, hh], b_scr.at[slot], b_sems.at[slot]
        )

    get_s(0, 0).start()
    get_b(0, 0).start()
    for hh in range(heads):
        slot = hh % 2
        if hh + 1 < heads:
            get_s((hh + 1) % 2, hh + 1).start()
            get_b((hh + 1) % 2, hh + 1).start()
        get_s(slot, hh).wait()
        get_b(slot, hh).wait()
        s = (s_scr[slot].astype(jnp.float32)
             + b_scr[slot].astype(jnp.float32))
        s = jnp.where(kmask, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, :, hh * d:(hh + 1) * d]
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, :, hh * d:(hh + 1) * d] = (out / l).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("length", "interpret"))
def _softmax_pv_impl(scores, v, lens, length, interpret=False):
    """``scores`` [B, H, Lp, Lp] and ``v`` [B, Lp, F] arrive padded to a
    DMA-tileable Lp (128-aligned; the caller pads q/k/v before the score
    dots — Mosaic rejects HBM DMA slices whose sublane dim is not
    8-aligned, e.g. the raw bottleneck length 500).  ``length`` is the
    true pre-pad length; padded keys are masked in-kernel and padded
    query rows are garbage the caller slices off."""
    b, h, lp, _ = scores.shape
    f = v.shape[-1]
    if 2 * lp * lp * scores.dtype.itemsize > FULL_ROW_SCRATCH_BYTES:
        lq, kb = pick_qk_blocks(lp, scores.dtype.itemsize)
        if kb == 0:
            return softmax_pv_reference(scores, v, lens[:, 0], length)
        kernel = functools.partial(_kernel_kb, length=length, lp=lp,
                                   heads=h, lq=lq, kb=kb)
        return pl.pallas_call(
            kernel,
            grid=(b, lp // lq),
            in_specs=[
                pl.BlockSpec((b, 1), lambda bb, qi: (0, 0),
                             memory_space=pltpu.SMEM),
                # scores stay in HBM; the kernel streams one [LQ, KB]
                # tile at a time through the double-buffered scratch
                pl.BlockSpec(memory_space=pl.ANY),
                # V stays block-resident across the q-block sweep
                pl.BlockSpec((1, lp, f), lambda bb, qi: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, lq, f), lambda bb, qi: (bb, qi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, lp, f), v.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, lq, kb), scores.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(lens, scores, v)
    kernel = functools.partial(_kernel, length=length, lp=lp, heads=h)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda bb: (0, 0),
                         memory_space=pltpu.SMEM),
            # scores stay in HBM; the kernel streams one [Lp, Lp] head
            # at a time through the double-buffered scratch
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, lp, f), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lp, f), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lp, f), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, lp, lp), scores.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(lens, scores, v)


@functools.partial(jax.jit, static_argnames=("length", "interpret"))
def _softmax_pv2_impl(scores, bias, v, lens, length, interpret=False):
    b, h, lp, _ = scores.shape
    f = v.shape[-1]
    kernel = functools.partial(_kernel2, length=length, lp=lp, heads=h)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda bb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, lp, f), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lp, f), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lp, f), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, lp, lp), scores.dtype),
            pltpu.VMEM((2, lp, lp), bias.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(lens, scores, bias, v)


def softmax_pv_reference(scores, v, lens=None, length=None, bias=None):
    """XLA reference: masked full-row softmax then ·V, native layouts.

    ``scores`` [B, H, Lp, Lp] pre-scaled; ``v`` [B, Lp, H*d]
    channels-last; ``length`` the true pre-pad length (keys at
    j >= min(length, lens[b]) are masked); ``bias`` an optional second
    scores tensor summed in f32 (the two-tensor kernel form).
    """
    if bias is not None:
        scores = scores.astype(jnp.float32) + bias.astype(jnp.float32)
    b, h, lp, _ = scores.shape
    d = v.shape[-1] // h
    length = lp if length is None else length
    key_len = (jnp.full((b,), length, jnp.int32) if lens is None
               else jnp.minimum(lens.astype(jnp.int32), length))
    kmask = jnp.arange(lp, dtype=jnp.int32)[None] < key_len[:, None]
    scores = jnp.where(kmask[:, None, None, :], scores,
                       jnp.float32(NEG_INF))
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    vh = v.reshape(b, lp, h, d)
    out = jnp.einsum("bhij,bjhd->bihd", attn, vh,
                     preferred_element_type=v.dtype)
    return out.reshape(b, lp, h * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def softmax_pv(scores, v, lens=None, length=None, interpret: bool = False,
               bias=None):
    """Masked softmax(scores [+ bias])·V with native-layout V/output.

    scores: [B, H, Lp, Lp] pre-softmax scores (1/sqrt(d) already
    applied), padded to a 128-aligned Lp by the caller; v: [B, Lp, H*d];
    lens: [B] int32 key-validity lengths or None; length: the true
    pre-pad length (default Lp); bias: optional second scores tensor
    (the rel-pos product) — passing it UNSUMMED lets both MXU dots write
    their output dtype directly and moves the add into VMEM, so the XLA
    add fusion's two L² reads + one L² write per block never happen.
    Output rows beyond ``length`` are garbage the caller slices off.
    Gradients recompute through the XLA reference (eval-only hot path;
    the train path uses softmax_pv_train.py).
    """
    length = scores.shape[2] if length is None else length
    lens2d = (jnp.full((scores.shape[0], 1), length, jnp.int32)
              if lens is None
              else lens.astype(jnp.int32).reshape(-1, 1))
    if bias is None:
        return _softmax_pv_impl(scores, v, lens2d, length, interpret)
    return _softmax_pv2_impl(scores, bias, v, lens2d, length, interpret)


def _fwd(scores, v, lens, length, interpret, bias):
    return (softmax_pv(scores, v, lens, length, interpret, bias),
            (scores, v, lens, bias))


def _bwd(length, interpret, res, g):
    scores, v, lens, bias = res
    if bias is None:
        _, vjp = jax.vjp(
            lambda s, vv: softmax_pv_reference(s, vv, lens, length),
            scores, v,
        )
        ds, dv = vjp(g)
        dbias = None
    else:
        _, vjp = jax.vjp(
            lambda s, vv, bb: softmax_pv_reference(s, vv, lens, length, bb),
            scores, v, bias,
        )
        ds, dv, dbias = vjp(g)
        dbias = dbias.astype(bias.dtype)
        ds = ds.astype(scores.dtype)
    lens_ct = (None if lens is None
               else np.zeros(lens.shape, jax.dtypes.float0))
    return ds, dv, lens_ct, dbias


softmax_pv.defvjp(_fwd, _bwd)
