"""Train-mode fused masked-softmax·dropout·V with a handwritten backward.

Why this exists: the single-block train kernel (attention_train.py) keeps
everything in VMEM but pays a barrel-shift band extraction in its forward
AND its adjoint (9 dynamic rolls of a [512, 1024] buffer each) plus a
per-(batch·head) d(pe) accumulation — profiled at ~28 ms of the 151 ms
SepReformer-B train step on v5e (profile_step.py family table: _fwd_impl
+ _bwd_impl).  The round-3 eval rework (ops/pallas/softmax_pv.py) showed
the better split: XLA's batched MXU dots already run the QKᵀ / rel-pos
bias products near the bandwidth floor when the bias comes from the
layout-pinned Pallas pos_kt (ops/pallas/relpos.py), so the kernel only
needs to own the part XLA does badly — the L² softmax round-trips.

This module is the train-time counterpart of softmax_pv:

- forward: scores [B, H, Lp, Lp] (bias + 1/sqrt(d) already applied, one
  HBM tensor) -> key-mask -> f32 softmax -> stateless hash dropout on the
  probabilities (same avalanche hash as the GCFN train kernel; mask is a
  pure function of (seed, global row, col), regenerated identically by
  the backward kernel and the jnp reference — nothing stored) -> ·V with
  V and the output in the model's native [B, Lp, F] layout.
- backward: recomputes the softmax from the SAME stored scores tensor
  (bit-identical to the forward's input), emits dV and dScores in one
  pass; dq / dk / d(pe table) then fall out of XLA's batched einsum
  adjoints and the pos_kt materializer's existing custom vjp — the
  barrel-scatter band adjoint and the sequential d(pe_pad) grid
  accumulation are gone entirely.

Gradient semantics (out = (P ∘ M/(1-p)) · V with P = softmax(S)):
  dV = (P ∘ M/(1-p))ᵀ · dOut
  dP = (dOut · Vᵀ) ∘ M/(1-p)
  dS = P ∘ (dP − rowsum(dP ∘ P))

Reference behavior being reproduced: attention-prob dropout between the
softmax and the ·V product, modules/network.py:114-124 of
SepReformer_Base_WSJ0 (same Bernoulli marginal; different mask stream,
like every hash-dropout kernel in this repo).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sepreformer_tpu.ops.pallas.gcfn_train import keep_mask

NEG_INF = -1.0e30


def supported_length(lp: int) -> bool:
    """One [Lp, Lp] f32 score tile plus temporaries must fit VMEM; 512 is
    the training bottleneck length's padded size (4 s crops -> L=500)."""
    return lp <= 512


def _drop_scale(seed, b, hh, heads, lp, col, p_drop):
    rows = (jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 0)
            + (b * heads + hh) * lp)
    return keep_mask(seed, 0, rows, col, p_drop) / (1.0 - p_drop)


def _fwd_kernel(seed_ref, lens_ref, s_hbm, b_hbm, v_ref, out_ref,
                s_scr, b_scr, s_sems, b_sems,
                *, length, lp, heads, p_drop, has_bias):
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
    if has_bias:
        get_b(0, 0).start()
    for hh in range(heads):
        slot = hh % 2
        if hh + 1 < heads:
            get_s((hh + 1) % 2, hh + 1).start()
            if has_bias:
                get_b((hh + 1) % 2, hh + 1).start()
        get_s(slot, hh).wait()
        s = s_scr[slot].astype(jnp.float32)
        if has_bias:
            get_b(slot, hh).wait()
            s = s + b_scr[slot].astype(jnp.float32)
        s = jnp.where(kmask, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=1, keepdims=True)
        if p_drop > 0.0:
            e = e * _drop_scale(seed_ref[0, 0], b, hh, heads, lp, col,
                                p_drop)
        v = v_ref[0, :, hh * d:(hh + 1) * d]
        out = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, :, hh * d:(hh + 1) * d] = (out / l).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, lens_ref, s_hbm, b_hbm, v_ref, dout_ref,
                ds_hbm, dv_ref, s_scr, b_scr, ds_scr,
                s_sems, b_sems, ds_sems,
                *, length, lp, heads, p_drop, has_bias):
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

    def put_ds(slot, hh):
        return pltpu.make_async_copy(
            ds_scr.at[slot], ds_hbm.at[b, hh], ds_sems.at[slot]
        )

    get_s(0, 0).start()
    if has_bias:
        get_b(0, 0).start()
    for hh in range(heads):
        slot = hh % 2
        if hh + 1 < heads:
            get_s((hh + 1) % 2, hh + 1).start()
            if has_bias:
                get_b((hh + 1) % 2, hh + 1).start()
        get_s(slot, hh).wait()
        s = s_scr[slot].astype(jnp.float32)
        if has_bias:
            get_b(slot, hh).wait()
            s = s + b_scr[slot].astype(jnp.float32)
        s = jnp.where(kmask, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
        if p_drop > 0.0:
            scale = _drop_scale(seed_ref[0, 0], b, hh, heads, lp, col,
                                p_drop)
            pd = p * scale
        else:
            scale = None
            pd = p
        v = v_ref[0, :, hh * d:(hh + 1) * d]
        dout = dout_ref[0, :, hh * d:(hh + 1) * d]
        # dV = Pdᵀ dOut — this head's static lane slice of the shared
        # [Lp, F] output block
        dv_ref[0, :, hh * d:(hh + 1) * d] = jax.lax.dot_general(
            pd.astype(dout.dtype), dout, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        # dP = (dOut Vᵀ) ∘ scale ; dS = P ∘ (dP − rowsum(dP ∘ P))
        dp = jax.lax.dot_general(
            dout, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if scale is not None:
            dp = dp * scale
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        if hh >= 2:
            # the outbound copy that used this scratch slot must land
            # before the slot is overwritten
            put_ds(slot, hh - 2).wait()
        ds_scr[slot] = ds.astype(ds_scr.dtype)
        put_ds(slot, hh).start()
    for hh in range(max(heads - 2, 0), heads):
        put_ds(hh % 2, hh).wait()


def _lens2d(lens, b, length):
    if lens is None:
        return jnp.full((b, 1), length, jnp.int32)
    return lens.astype(jnp.int32).reshape(b, 1)


def _common_specs(b, lp, f):
    seed = pl.BlockSpec((1, 1), lambda bb: (0, 0),
                        memory_space=pltpu.SMEM)
    lens = pl.BlockSpec((b, 1), lambda bb: (0, 0),
                        memory_space=pltpu.SMEM)
    # scores (and dScores) stay in HBM; the kernels stream one [Lp, Lp]
    # head at a time through double-buffered scratch
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    bf = pl.BlockSpec((1, lp, f), lambda bb: (bb, 0, 0),
                      memory_space=pltpu.VMEM)
    return seed, lens, hbm, bf


def _bias_arg(scores, bias):
    """has_bias is a static kernel parameter; the no-bias call still
    passes a (never-read) placeholder so the kernel arity is fixed."""
    if bias is None:
        return jnp.zeros((1, 1, 8, 128), scores.dtype), False
    return bias, True


@functools.partial(
    jax.jit, static_argnames=("length", "p_drop", "interpret")
)
def _fwd_impl(scores, v, seed, lens, length, p_drop, interpret=False,
              bias=None):
    b, h, lp, _ = scores.shape
    f = v.shape[-1]
    seed_s, lens_s, hbm_s, bf_s = _common_specs(b, lp, f)
    bias_arr, has_bias = _bias_arg(scores, bias)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, length=length, lp=lp, heads=h,
                          p_drop=p_drop, has_bias=has_bias),
        grid=(b,),
        in_specs=[seed_s, lens_s, hbm_s, hbm_s, bf_s],
        out_specs=bf_s,
        out_shape=jax.ShapeDtypeStruct((b, lp, f), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, lp, lp), scores.dtype),
            pltpu.VMEM((2, lp, lp) if has_bias else (1, 8, 128),
                       bias_arr.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1),
      _lens2d(lens, b, length), scores, bias_arr, v)


@functools.partial(
    jax.jit, static_argnames=("length", "p_drop", "interpret")
)
def _bwd_impl(scores, v, seed, lens, dout, length, p_drop, interpret=False,
              bias=None):
    b, h, lp, _ = scores.shape
    f = v.shape[-1]
    seed_s, lens_s, hbm_s, bf_s = _common_specs(b, lp, f)
    bias_arr, has_bias = _bias_arg(scores, bias)
    ds, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, length=length, lp=lp, heads=h,
                          p_drop=p_drop, has_bias=has_bias),
        grid=(b,),
        in_specs=[seed_s, lens_s, hbm_s, hbm_s, bf_s, bf_s],
        out_specs=[hbm_s, bf_s],
        out_shape=[
            # dScores in the scores' storage dtype: its consumers are the
            # dq/dk/dpe MXU dots, which run bf16-precision passes anyway
            jax.ShapeDtypeStruct((b, h, lp, lp), scores.dtype),
            jax.ShapeDtypeStruct((b, lp, f), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, lp, lp), scores.dtype),
            pltpu.VMEM((2, lp, lp) if has_bias else (1, 8, 128),
                       bias_arr.dtype),
            pltpu.VMEM((2, lp, lp), scores.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1),
      _lens2d(lens, b, length), scores, bias_arr, v, dout.astype(v.dtype))
    return ds, dv


def softmax_pv_dropout_reference(scores, v, seed, lens=None, length=None,
                                 p_drop=0.0, bias=None):
    """Pure-jnp reference with the identical hash dropout (tests must
    match the kernels exactly at f32)."""
    if bias is not None:
        scores = scores.astype(jnp.float32) + bias.astype(jnp.float32)
    b, h, lp, _ = scores.shape
    d = v.shape[-1] // h
    length = lp if length is None else length
    key_len = (jnp.full((b,), length, jnp.int32) if lens is None
               else jnp.minimum(lens.astype(jnp.int32), length))
    kmask = jnp.arange(lp, dtype=jnp.int32)[None] < key_len[:, None]
    s = jnp.where(kmask[:, None, None, :], scores.astype(jnp.float32),
                  NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    if p_drop > 0.0:
        bh = jnp.arange(b * h, dtype=jnp.int32).reshape(b, h, 1, 1)
        rows = bh * lp + jnp.arange(lp, dtype=jnp.int32).reshape(1, 1, lp, 1)
        cols = jnp.arange(lp, dtype=jnp.int32).reshape(1, 1, 1, lp)
        p = p * keep_mask(jnp.asarray(seed, jnp.int32), 0, rows, cols,
                          p_drop) / (1.0 - p_drop)
    vh = v.reshape(b, lp, h, d)
    out = jnp.einsum("bhij,bjhd->bihd", p.astype(v.dtype), vh,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.reshape(b, lp, h * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def softmax_pv_dropout(scores, v, seed, lens=None, length=None,
                       p_drop: float = 0.0, interpret: bool = False,
                       bias=None):
    """Masked softmax(scores [+ bias]) with attention-prob hash dropout,
    times V.

    scores: [B, H, Lp, Lp] pre-softmax scores (1/sqrt(d) already
    applied), Lp 128-aligned; v: [B, Lp, H*d] channels-last; seed: int32
    scalar driving the stateless dropout hash; lens: [B] int32 key
    validity lengths or None; length: true pre-pad length; bias: an
    optional second scores tensor (the rel-pos product), summed with
    ``scores`` in VMEM after the f32 upcast — both producing MXU dots
    then write their output dtype directly and the XLA add fusion never
    exists.  Rows beyond ``length`` are garbage the caller slices off
    (their upstream gradient is zero after the slice, so no masking is
    needed in the backward).  The backward kernel recomputes the softmax
    from the same stored tensors and returns (dScores, dV) — dScores is
    also the bias cotangent (the add distributes it), so the same buffer
    feeds both einsum adjoints; everything upstream differentiates
    through XLA.
    """
    length = scores.shape[2] if length is None else length
    return _fwd_impl(scores, v, seed, lens, length, float(p_drop),
                     interpret, bias)


def _vjp_fwd(scores, v, seed, lens, length, p_drop, interpret, bias=None):
    out = softmax_pv_dropout(scores, v, seed, lens, length, p_drop,
                             interpret, bias)
    return out, (scores, v, seed, lens, bias)


def _vjp_bwd(length, p_drop, interpret, res, g):
    scores, v, seed, lens, bias = res
    length = scores.shape[2] if length is None else length
    ds, dv = _bwd_impl(scores, v, seed, lens, g, length, float(p_drop),
                       interpret, bias)
    lens_ct = (None if lens is None
               else np.zeros(lens.shape, jax.dtypes.float0))
    dbias = None if bias is None else ds.astype(bias.dtype)
    return (ds.astype(scores.dtype), dv.astype(v.dtype),
            np.zeros((), jax.dtypes.float0), lens_ct, dbias)


softmax_pv_dropout.defvjp(_vjp_fwd, _vjp_bwd)
