"""Fused pairwise SI-SNR PIT kernel equivalence tests (interpreter mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sepreformer_tpu.losses import pit_sisnr_time, sisnr_pairwise_neg
from sepreformer_tpu.ops.pallas.pit import (
    sisnr_pairwise_neg_fused,
    supports,
)


def _signals(rng, s=2, b=3, t=4000, snr=0.3):
    src = rng.normal(size=(s, b, t)).astype(np.float32)
    # estimates correlated with sources so SI-SNRs span a realistic range
    est = (src[::-1] * 0.2 + src * 1.1
           + snr * rng.normal(size=(s, b, t))).astype(np.float32)
    return jnp.asarray(est), jnp.asarray(src)


def test_supports():
    assert supports(32000, 2)
    assert supports(8 * 60 * 1000, 2) is False   # ~49 s cap at S=2
    assert not supports(64, 2)


@pytest.mark.parametrize("s,b,t", [(2, 3, 4000), (2, 1, 32000), (3, 2, 1024)])
def test_pairwise_matches_reference(rng, s, b, t):
    est, src = _signals(np.random.default_rng(0), s=s, b=b, t=t)
    ref = sisnr_pairwise_neg(est, src)
    out = sisnr_pairwise_neg_fused(est, src, True, 1.0e-8, -30.0, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_clamp_and_scale_variants(rng):
    est, src = _signals(np.random.default_rng(1))
    # uncorrelated garbage estimate exercises the -30 dB clamp
    est = jnp.asarray(np.random.default_rng(2).normal(size=est.shape),
                      jnp.float32)
    ref = sisnr_pairwise_neg(est, src, scale_inv=False)
    out = sisnr_pairwise_neg_fused(est, src, False, 1.0e-8, -30.0, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(out) >= -30.0)


def test_high_sisnr_accuracy():
    """Near-perfect estimates (the cancellation-prone regime) must still
    agree with the direct-residual XLA computation."""
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.normal(size=(2, 2, 8000)), jnp.float32)
    est = src * 1.01 + 1e-3 * jnp.asarray(
        rng.normal(size=src.shape), jnp.float32)
    ref = sisnr_pairwise_neg(est, src)
    out = sisnr_pairwise_neg_fused(est, src, True, 1.0e-8, -30.0, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_gradients_match(rng):
    est, src = _signals(np.random.default_rng(4), t=2000)

    def loss_fused(e, s):
        return jnp.sum(sisnr_pairwise_neg_fused(e, s, True, 1.0e-8, -30.0,
                                                True))

    def loss_ref(e, s):
        return jnp.sum(sisnr_pairwise_neg(e, s))

    g_f = jax.grad(loss_fused, argnums=(0, 1))(est, src)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(est, src)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pit_loss_impl_knob(rng):
    est, src = _signals(np.random.default_rng(5))
    ref = pit_sisnr_time(est, src, impl="xla")
    out = pit_sisnr_time(est, src, impl="interpret")
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5, atol=1e-5)
