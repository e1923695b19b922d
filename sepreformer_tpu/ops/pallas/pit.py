"""Fused pairwise SI-SNR kernel: the uPIT scoring table in one VMEM pass.

Computes the [B, est_spk, src_spk] negative SI-SNR table that drives
utterance-level PIT (reference semantics: criterions.py:178-217 — eps
1e-8, scale-invariant projection, per-utterance clamp at -30 dB) without
materializing any [spks, spks, B, T] intermediates: per batch entry the
kernel keeps est/src [S, T] resident in VMEM and reduces everything —
means, the S x S projection dot table (one MXU matmul), energies, norms,
log10 — to the [S, S] output in a single pass.

Perf context: at num_spks=2 the XLA path's intermediates are small and
this kernel is about HBM-traffic hygiene (est/src read once instead of
~5x) rather than step time — the loss is a tiny fraction of a train step
either way (measured; see tests/test_pallas_pit.py and perf_lab).  It
exists because the pairwise table generalizes to higher speaker counts
where the [S, S, B, T] broadcast would hurt, and as the fused-loss
deliverable of the build plan (SURVEY.md §7).

Gradients fall back to the XLA reference via custom_vjp (recompute) —
the backward is exercised every training step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pit_kernel(e_ref, s_ref, out_ref, *, eps: float,
                clamp_db: Optional[float], scale_inv: bool, t: int):
    e = e_ref[0].astype(jnp.float32)            # [S, T]
    s = s_ref[0].astype(jnp.float32)
    inv_t = np.float32(1.0 / t)
    e = e - jnp.sum(e, axis=1, keepdims=True) * inv_t
    s = s - jnp.sum(s, axis=1, keepdims=True) * inv_t
    # dots[i, j] = <e_i, s_j>; energies on the diagonal path
    dots = jax.lax.dot_general(
        e, s, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # [S_e, S_s]
    ss = jnp.sum(s * s, axis=1, keepdims=True)   # [S_s, 1]
    ss_row = ss.reshape(1, -1)                   # [1, S_s]
    if scale_inv:
        scale = dots / (ss_row + eps)
        num_sq = scale * scale * ss_row                      # ||scale*s||^2
    else:
        scale = jnp.ones_like(dots)
        num_sq = jnp.broadcast_to(ss_row, dots.shape)
    # residual computed explicitly (not via the expanded quadratic form,
    # which cancels catastrophically in f32 at high SI-SNR)
    d = e[:, None, :] - scale[:, :, None] * s[None, :, :]    # [S_e, S_s, T]
    den_sq = jnp.sum(d * d, axis=2)
    ratio = jnp.sqrt(num_sq) / (jnp.sqrt(den_sq) + eps)
    log10e = np.float32(np.log10(np.e))
    loss = -20.0 * log10e * jnp.log(eps + ratio)
    if clamp_db is not None:
        loss = jnp.maximum(loss, clamp_db)
    out_ref[0] = loss


@functools.partial(
    jax.jit, static_argnames=("scale_inv", "eps", "clamp_db", "interpret")
)
def _impl(est, src, scale_inv, eps, clamp_db, interpret=False):
    s_spk, b, t = est.shape
    e_b = jnp.swapaxes(est, 0, 1)                # [B, S, T]
    s_b = jnp.swapaxes(src, 0, 1)
    kernel = functools.partial(
        _pit_kernel, eps=eps, clamp_db=clamp_db, scale_inv=scale_inv, t=t
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s_spk, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_spk, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_spk, s_spk), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_spk, s_spk), jnp.float32),
        interpret=interpret,
    )(e_b, s_b)
    return out


def supports(t: int, s_spk: int = 2) -> bool:
    """One batch entry's arrays must fit VMEM: (2*S + S^2) * T f32 live.
    At S=2 that allows ~45 s of 8 kHz audio; longer utterances (rare,
    eval-only) fall back to the XLA path."""
    return 128 <= t and (2 * s_spk + s_spk * s_spk) * t * 4 <= 12 * 2**20


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
def sisnr_pairwise_neg_fused(
    est, src, scale_inv: bool = True, eps: float = 1.0e-8,
    clamp_db: Optional[float] = -30.0, interpret: bool = False,
):
    """Fused [B, S, S] negative SI-SNR table; est/src: [S, B, T].

    Drop-in replacement for losses.sisnr_pairwise_neg (same semantics,
    XLA-reference gradients via recompute).
    """
    return _impl(est, src, scale_inv, eps, clamp_db, interpret)


def _fwd(est, src, scale_inv, eps, clamp_db, interpret):
    return _impl(est, src, scale_inv, eps, clamp_db, interpret), (est, src)


def _bwd(scale_inv, eps, clamp_db, interpret, res, g):
    from sepreformer_tpu.losses import sisnr_pairwise_neg

    est, src = res
    _, vjp = jax.vjp(
        lambda e, s: sisnr_pairwise_neg(
            e, s, scale_inv=scale_inv, eps=eps, clamp_db=clamp_db
        ),
        est, src,
    )
    return vjp(g)


sisnr_pairwise_neg_fused.defvjp(_fwd, _bwd)
