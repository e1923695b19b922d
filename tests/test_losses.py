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
