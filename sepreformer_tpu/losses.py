"""PIT losses and metrics, fully vectorized for TPU.

The reference evaluates each speaker permutation in a Python loop
(utils/implements/criterions.py:154-176, 196-217).  Here all permutations
are scored in one batched pass: pairwise speaker-to-source scores are
computed as a [B, spks, spks] table and permutation totals are gathered from
it — no Python-level loop over utterances and no repeated STFTs (the
reference re-runs the STFT per permutation; we compute each spectrogram
once).

Numerical conventions match the reference exactly:
- SI-SNR time loss: eps=1e-8, per-utterance clamp at -30 dB
  (criterions.py:196-217)
- magnitude loss: eps=1e-12, scale clamp >= 1e-2, Frobenius norms of the
  window-scaled STFT magnitudes (criterions.py:154-176)
- SI-SNRi metric: PIT-max of summed per-speaker improvements, eps passed by
  the caller (1e-15 in engine.py:132) (criterions.py:219-260)
- batch reduction: sum over utterances / num_utterances; the engine divides
  by num_spks afterwards (engine.py:74)
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _perm_matrix(num_spks: int) -> np.ndarray:
    """All permutations as an index array [P, spks]."""
    return np.asarray(list(itertools.permutations(range(num_spks))), np.int32)


def _gather_perm_totals(pair_scores: jnp.ndarray) -> jnp.ndarray:
    """[B, est_spk, src_spk] pairwise scores -> [P, B] permutation totals."""
    num_spks = pair_scores.shape[1]
    perms = _perm_matrix(num_spks)
    # totals[p, b] = sum_s pair_scores[b, s, perms[p, s]]
    return jnp.stack(
        [
            sum(pair_scores[:, s, perms[p, s]] for s in range(num_spks))
            for p in range(len(perms))
        ]
    )


def _zero_mean(x: jnp.ndarray) -> jnp.ndarray:
    return x - jnp.mean(x, axis=-1, keepdims=True)


def _l2(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(x * x, axis=-1))


def sisnr_pairwise_neg(
    est: jnp.ndarray,
    src: jnp.ndarray,
    scale_inv: bool = True,
    eps: float = 1.0e-8,
    clamp_db: Optional[float] = -30.0,
) -> jnp.ndarray:
    """Negative SI-SNR for every (est speaker, src speaker) pair.

    est, src: [spks, B, T].  Returns [B, spks, spks].
    """
    e = _zero_mean(est)[:, None]      # [spks_e, 1, B, T]
    s = _zero_mean(src)[None, :]      # [1, spks_s, B, T]
    if scale_inv:
        scale = jnp.sum(e * s, axis=-1, keepdims=True) / (
            jnp.sum(s * s, axis=-1, keepdims=True) + eps
        )
        s = scale * s
    loss = -20.0 * jnp.log10(eps + _l2(s) / (_l2(e - s) + eps))
    if clamp_db is not None:
        loss = jnp.maximum(loss, clamp_db)
    return loss.transpose(2, 0, 1)    # [B, spks_e, spks_s]


def pit_sisnr_time(
    est: jnp.ndarray,
    src: jnp.ndarray,
    scale_inv: bool = True,
    impl: str = "auto",
) -> jnp.ndarray:
    """uPIT time-domain SI-SNR training loss (criterions.py:178-217).

    est, src: [spks, B, T].  Returns scalar: mean over utterances of the
    min-permutation summed speaker loss (caller divides by num_spks).

    impl: "auto" (fused Pallas pairwise table on TPU, XLA elsewhere),
    "xla", "pallas", "interpret".
    """
    from sepreformer_tpu.ops.pallas import pit as pit_kernel

    use_fused = (
        impl in ("pallas", "interpret")
        or (impl == "auto" and jax.default_backend() == "tpu")
    ) and pit_kernel.supports(est.shape[-1], est.shape[0])
    if use_fused:
        pair = pit_kernel.sisnr_pairwise_neg_fused(
            est, src, scale_inv, 1.0e-8, -30.0, impl == "interpret"
        )
    else:
        pair = sisnr_pairwise_neg(est, src, scale_inv=scale_inv)
    totals = _gather_perm_totals(pair)            # [P, B]
    return jnp.mean(jnp.min(totals, axis=0))


def stft_mag_pairwise_neg(
    est: jnp.ndarray,
    src: jnp.ndarray,
    stft_kernel: jax.typing.ArrayLike,  # host np constant or device array
    frame_shift: int,
    scale_inv: bool = True,
    eps: float = 1.0e-12,
    mel_fb: Optional[jax.typing.ArrayLike] = None,
) -> jnp.ndarray:
    """Negative spectral SDR for every speaker pair (criterions.py:154-171).

    est, src: [spks, B, T].  Returns [B, spks, spks].  Spectrograms are
    computed once per (pair, scale) — note the reference's scale-invariant
    projection rescales the *source* per pair, so the source STFT is
    pair-dependent; the estimate STFT is shared across source pairings.

    ``mel_fb`` ([n_freqs, n_mels], ops/stft.py::make_mel_filterbank)
    switches on the reference's ``mel_opt`` branch (criterions.py:165-167):
    magnitudes are projected onto the mel scale before the Frobenius norms.
    """
    from sepreformer_tpu.ops.stft import stft_magnitude

    spks, b, t = est.shape
    e = _zero_mean(est)
    s = _zero_mean(src)

    def mag(x):
        m = stft_magnitude(x, stft_kernel, frame_shift)
        if mel_fb is not None:
            m = jnp.einsum("btf,fm->btm", m, mel_fb.astype(m.dtype),
                           preferred_element_type=m.dtype)
        return m

    # est spectrograms: one per estimated speaker
    mag_e = mag(e.reshape(spks * b, t))
    mag_e = mag_e.reshape(spks, 1, b, *mag_e.shape[1:])
    # pair-dependent scaled sources
    ee = e[:, None]                                # [spks_e, 1, B, T]
    ss = jnp.broadcast_to(s[None, :], (spks, spks, b, t))
    if scale_inv:
        scale = jnp.sum(ee * ss, axis=-1, keepdims=True) / (
            jnp.sum(ss * ss, axis=-1, keepdims=True) + eps
        )
        ss = jnp.maximum(scale, 1.0e-2) * ss       # clamp (criterions.py:163)
    nb = (stft_kernel.shape[1] // 2 if mel_fb is None
          else mel_fb.shape[1])
    mag_s = mag(
        ss.reshape(spks * spks * b, t)
    ).reshape(spks, spks, b, -1, nb)
    num = jnp.sqrt(jnp.sum(mag_s * mag_s, axis=(-2, -1)))
    den = jnp.sqrt(jnp.sum((mag_e - mag_s) ** 2, axis=(-2, -1)))
    loss = -20.0 * jnp.log10(eps + num / (den + eps))
    return loss.transpose(2, 0, 1)


def pit_sisnr_mag(
    est: jnp.ndarray,
    src: jnp.ndarray,
    stft_kernel: jax.typing.ArrayLike,  # host np constant or device array
    frame_shift: int,
    scale_inv: bool = True,
    mel_fb: Optional[jax.typing.ArrayLike] = None,
) -> jnp.ndarray:
    """uPIT spectral-magnitude aux loss (criterions.py:115-176). Scalar.
    ``mel_fb`` enables the ``mel_opt`` mel-frontend branch."""
    pair = stft_mag_pairwise_neg(
        est, src, stft_kernel, frame_shift, scale_inv=scale_inv,
        mel_fb=mel_fb,
    )
    totals = _gather_perm_totals(pair)
    return jnp.mean(jnp.min(totals, axis=0))


def sisnr_db(
    est: jnp.ndarray, src: jnp.ndarray, eps: float = 1.0e-15
) -> jnp.ndarray:
    """Scale-invariant SNR (dB), elementwise over matching leading dims."""
    e = _zero_mean(est)
    s = _zero_mean(src)
    scale = jnp.sum(e * s, axis=-1, keepdims=True) / (
        jnp.sum(s * s, axis=-1, keepdims=True) + eps
    )
    s = scale * s
    return 20.0 * jnp.log10(eps + _l2(s) / (_l2(e - s) + eps))


def pit_sisnr_improvement(
    est: jnp.ndarray,
    src: jnp.ndarray,
    mixture: jnp.ndarray,
    eps: float = 1.0e-15,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SI-SNRi eval metric (criterions.py:219-260).

    est, src: [spks, B, T]; mixture: [B, T].  Returns (batch-mean SI-SNRi,
    per-source improvements of the best permutation [B, spks]); permutation
    chosen by PIT-max of the summed improvements.

    Note: the reference (criterions.py:256) takes the max over permutations
    *per speaker independently* — a quirk that only differs from true
    PIT-max when speakers disagree on the best permutation, which does not
    happen for usable separations.  We implement true PIT-max.
    """
    spks = est.shape[0]
    e = _zero_mean(est)[:, None]
    s = _zero_mean(src)[None, :]
    m = _zero_mean(mixture)[None, None]

    def proj_snr(x, t):
        scale = jnp.sum(x * t, axis=-1, keepdims=True) / (
            jnp.sum(t * t, axis=-1, keepdims=True) + eps
        )
        tt = scale * t
        return 20.0 * jnp.log10(eps + _l2(tt) / (_l2(x - tt) + eps))

    snr_est = proj_snr(e, s)                          # [spks_e, spks_s, B]
    snr_mix = proj_snr(jnp.broadcast_to(m, e.shape), s)
    improvement = (snr_est - snr_mix).transpose(2, 0, 1)  # [B, e, s]
    totals = _gather_perm_totals(improvement)             # [P, B]
    best = jnp.argmax(totals, axis=0)                     # [B]
    # numpy constant (host-side embed at lowering; an eager jnp.asarray
    # would create a device constant fetched back synchronously)
    perms = np.asarray(_perm_matrix(spks))
    chosen = jnp.take(perms, best, axis=0)                # [B, spks]
    # per_src[b, s] = improvement[b, s, chosen[b, s]]
    per_src = jnp.take_along_axis(
        improvement, chosen[:, :, None], axis=2
    )[..., 0]                                             # [B, spks]
    return jnp.mean(jnp.max(totals, axis=0)), per_src


def progressive_alpha(
    epoch: int,
    alpha: float = 0.4,
    decay_start: int = 100,
    decay_factor: float = 0.8,
    decay_every: int = 5,
) -> float:
    """Aux-loss weight schedule (engine.py:72): 0.4 until epoch 100, then
    0.4 * 0.8**(1 + (epoch-101)//5)."""
    if epoch <= decay_start:
        return alpha
    return alpha * decay_factor ** (1 + (epoch - (decay_start + 1)) // decay_every)
