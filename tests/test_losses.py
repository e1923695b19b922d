"""PIT loss/metric invariant tests.

The reference criterion module cannot be imported (depends on mir_eval,
absent); instead we verify the documented invariants and hand-computed
values (criterions.py semantics listed in losses.py docstrings).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sepreformer_tpu.losses import (
    pit_sisnr_improvement,
    pit_sisnr_mag,
    pit_sisnr_time,
    progressive_alpha,
    sisnr_db,
)
from sepreformer_tpu.ops.stft import make_stft_kernel


def _signals(rng, b=3, t=4000):
    src = rng.normal(size=(2, b, t)).astype(np.float32)
    return jnp.asarray(src)


def test_time_loss_perfect_reconstruction_hits_clamp(rng):
    src = _signals(rng)
    # est == src -> SI-SNR -> +inf, loss -> -inf, clamped at -30 per speaker
    loss = pit_sisnr_time(src, src)
    np.testing.assert_allclose(float(loss), -60.0, atol=1e-3)


def test_time_loss_permutation_invariance(rng):
    src = _signals(rng)
    est = src + 0.1 * jnp.asarray(
        np.random.default_rng(1).normal(size=src.shape).astype(np.float32)
    )
    loss_direct = pit_sisnr_time(est, src)
    loss_swapped = pit_sisnr_time(est[::-1], src)
    np.testing.assert_allclose(float(loss_direct), float(loss_swapped), rtol=1e-6)


def test_time_loss_scale_invariance(rng):
    src = _signals(rng)
    est = src + 0.05 * jnp.asarray(
        np.random.default_rng(1).normal(size=src.shape).astype(np.float32)
    )
    l1 = pit_sisnr_time(est, src)
    l2 = pit_sisnr_time(est, 3.7 * src)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)


def test_sisnr_matches_manual_numpy(rng):
    t = 2000
    s = rng.normal(size=(t,)).astype(np.float64)
    n = rng.normal(size=(t,)).astype(np.float64)
    e = s + 0.3 * n
    # manual zero-mean projection SI-SNR
    sz = s - s.mean()
    ez = e - e.mean()
    proj = (ez @ sz) / (sz @ sz) * sz
    expect = 10 * np.log10((proj @ proj) / ((ez - proj) @ (ez - proj)))
    got = float(sisnr_db(jnp.asarray(e, jnp.float32)[None], jnp.asarray(s, jnp.float32)[None])[0])
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_mag_loss_finite_and_permutation_invariant(rng):
    src = _signals(rng, b=2, t=2048)
    est = src + 0.1 * jnp.asarray(
        np.random.default_rng(1).normal(size=src.shape).astype(np.float32)
    )
    kernel = jnp.asarray(make_stft_kernel(256, 64))
    l1 = pit_sisnr_mag(est, src, kernel, 64)
    l2 = pit_sisnr_mag(est[::-1], src, kernel, 64)
    assert np.isfinite(float(l1))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_sisnri_improvement_positive_for_good_separation(rng):
    t = 4000
    src = _signals(rng, b=2, t=t)
    mixture = src[0] + src[1]
    # near-perfect estimates -> large positive improvement
    est = src + 1e-3 * jnp.asarray(
        np.random.default_rng(1).normal(size=src.shape).astype(np.float32)
    )
    mean_imp, per_src = pit_sisnri = pit_sisnr_improvement(est, src, mixture)
    assert float(mean_imp) > 20.0
    assert per_src.shape == (2, 2)
    # permutation recovery: swapped estimates give identical metric
    mean_imp_sw, _ = pit_sisnr_improvement(est[::-1], src, mixture)
    np.testing.assert_allclose(float(mean_imp), float(mean_imp_sw), rtol=1e-5)


def test_progressive_alpha_schedule():
    # engine.py:72 — 0.4 through epoch 100, then stepped decay every 5 epochs
    assert progressive_alpha(1) == 0.4
    assert progressive_alpha(100) == 0.4
    np.testing.assert_allclose(progressive_alpha(101), 0.4 * 0.8)
    np.testing.assert_allclose(progressive_alpha(105), 0.4 * 0.8)
    np.testing.assert_allclose(progressive_alpha(106), 0.4 * 0.8**2)
    np.testing.assert_allclose(progressive_alpha(111), 0.4 * 0.8**3)


def test_mel_filterbank_properties():
    """make_mel_filterbank reproduces torchaudio MelScale's default HTK
    filterbank (torchaudio absent here; checked against its published
    formula): triangular, partition-of-unity-free (norm=None), peaks
    ordered and monotone in frequency."""
    from sepreformer_tpu.ops.stft import make_mel_filterbank

    n_freqs, n_mels, sr = 129, 80, 16000
    fb = make_mel_filterbank(n_freqs, n_mels, sr)
    assert fb.shape == (n_freqs, n_mels)
    assert (fb >= 0).all() and np.isfinite(fb).all()
    assert fb.sum() > 0
    # hand-check every filter against the formula: mel points are uniform
    # in HTK mel between 0 and sr/2
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    m_pts = np.linspace(0.0, hz2mel(sr / 2), n_mels + 2)
    f_pts = 700.0 * (10 ** (m_pts / 2595.0) - 1.0)
    freqs = np.linspace(0, sr // 2, n_freqs)
    for i in range(n_mels):
        lo, mid, hi = f_pts[i], f_pts[i + 1], f_pts[i + 2]
        expect = np.clip(
            np.minimum((freqs - lo) / (mid - lo), (hi - freqs) / (hi - mid)),
            0.0, None,
        )
        np.testing.assert_allclose(fb[:, i], expect, atol=1e-4)


def test_mag_loss_mel_opt_branch(rng):
    """mel_fb changes the magnitude loss (the mel projection is applied),
    stays finite/permutation-invariant, and matches a dense reimplementation
    of the reference's mel branch (criterions.py:165-167)."""
    from sepreformer_tpu.losses import stft_mag_pairwise_neg
    from sepreformer_tpu.ops.stft import make_mel_filterbank, stft_magnitude

    src = _signals(rng, b=2, t=2048)
    est = src + 0.1 * jnp.asarray(
        np.random.default_rng(1).normal(size=src.shape).astype(np.float32)
    )
    kernel = jnp.asarray(make_stft_kernel(256, 64))
    fb = jnp.asarray(make_mel_filterbank(256 // 2 + 1))
    l_plain = pit_sisnr_mag(est, src, kernel, 64)
    l_mel = pit_sisnr_mag(est, src, kernel, 64, mel_fb=fb)
    l_mel_swap = pit_sisnr_mag(est[::-1], src, kernel, 64, mel_fb=fb)
    assert np.isfinite(float(l_mel))
    assert abs(float(l_mel) - float(l_plain)) > 1e-3  # branch is live
    np.testing.assert_allclose(float(l_mel), float(l_mel_swap), rtol=1e-5)

    # dense check of one pair score (identity permutation, no scale_inv):
    pair = stft_mag_pairwise_neg(est, src, kernel, 64, scale_inv=False,
                                 mel_fb=fb)
    e = est[0, 0] - est[0, 0].mean()
    s = src[0, 0] - src[0, 0].mean()
    me = np.asarray(stft_magnitude(e[None], kernel, 64))[0] @ np.asarray(fb)
    ms = np.asarray(stft_magnitude(s[None], kernel, 64))[0] @ np.asarray(fb)
    num = np.sqrt((ms * ms).sum())
    den = np.sqrt(((me - ms) ** 2).sum())
    want = -20.0 * np.log10(1e-12 + num / (den + 1e-12))
    np.testing.assert_allclose(float(pair[0, 0, 0]), want, rtol=1e-5)
