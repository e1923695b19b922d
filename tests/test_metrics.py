"""Host metric tests: SI-SNRi and the native BSS-eval implementation."""

import numpy as np
import pytest

from sepreformer_tpu.metrics import (
    bss_eval_sources,
    pit_sisnri_np,
    sdri_np,
    sisnr_np,
)


def test_sisnr_known_value(rng):
    t = 8000
    s = rng.normal(size=t)
    n = rng.normal(size=t)
    # est = s + noise at exactly -10 dB relative power
    n = n / np.linalg.norm(n) * np.linalg.norm(s) * 10 ** (-10 / 20)
    est = s + n
    val = sisnr_np(est, s)
    assert 9.0 < val < 11.0


def test_pit_sisnri_recovers_permutation(rng):
    t = 8000
    src = rng.normal(size=(2, t))
    mix = src.sum(axis=0)
    est = src[::-1] + 0.01 * rng.normal(size=(2, t))  # swapped
    mean_i, per = pit_sisnri_np(est, src, mix)
    assert mean_i > 15.0
    assert per.shape == (2,)


def test_bss_eval_perfect_reconstruction(rng):
    t = 4000
    ref = rng.normal(size=(2, t))
    sdr, sir, sar, perm = bss_eval_sources(ref, ref.copy())
    assert (sdr > 100).all()          # numerically near-perfect
    assert sorted(perm.tolist()) == [0, 1]


def test_bss_eval_handles_filtered_reference(rng):
    """SDR is invariant to short filtering of the reference (the 512-tap
    projection should absorb a small delay)."""
    t = 6000
    ref = rng.normal(size=(1, t))
    delayed = np.concatenate([np.zeros(5), ref[0, :-5]])[None, :]
    sdr, sir, _, _ = bss_eval_sources(ref, delayed)
    # residual is only the 5 edge samples the finite filter cannot place
    assert sdr[0] > 35.0
    assert sir[0] > 100.0  # no interference term for a single source


def test_bss_eval_noise_level(rng):
    t = 6000
    ref = rng.normal(size=(2, t))
    noise = rng.normal(size=(2, t))
    noise *= np.linalg.norm(ref, axis=1, keepdims=True) / np.linalg.norm(
        noise, axis=1, keepdims=True
    ) * 10 ** (-12 / 20)
    est = ref + noise
    sdr, _, _, perm = bss_eval_sources(ref, est)
    assert np.all(sdr > 8.0) and np.all(sdr < 16.0)
    assert perm.tolist() == [0, 1]


def test_sdri_improves_for_good_separation(rng):
    t = 6000
    src = rng.normal(size=(2, t))
    mix = src.sum(axis=0)
    est = src + 0.01 * rng.normal(size=(2, t))
    mean_sdri, per = sdri_np(est, src, mix)
    assert mean_sdri > 10.0
    assert per.shape == (2,)
