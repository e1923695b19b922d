"""Large-kernel depthwise conv Pallas kernel tests (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sepreformer_tpu.ops.pallas.depthwise import (
    _impl_fwd,
    depthwise_large,
    depthwise_reference,
    supports,
)


def test_supports():
    assert supports(8000, 128)
    assert supports(500, 256)
    assert supports(9000, 128)
    assert not supports(500, 64)     # channels not a multiple of 128
    from sepreformer_tpu.ops.pallas.depthwise import pick_time_block
    assert pick_time_block(8000) == 2000
    assert pick_time_block(500) == 500
    assert pick_time_block(20011) == 0  # prime, no divisor


@pytest.mark.parametrize("b,t,c,k", [(2, 256, 128, 65), (1, 500, 256, 33),
                                     (2, 200, 128, 9)])
def test_forward_matches_reference(rng, b, t, c, k):
    x = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, c)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    # the kernel forward (kept for benchmarking; production fwd is XLA)
    out = _impl_fwd(x, w, bias, True)
    ref = depthwise_reference(x, w, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference(rng):
    b, t, c, k = 2, 256, 128, 65
    x = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, c)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)

    def loss_k(x, w, bias):
        return jnp.sum(depthwise_large(x, w, bias, True) ** 2)

    def loss_r(x, w, bias):
        return jnp.sum(depthwise_reference(x, w, bias) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, w, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, bias)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_gradients_match_reference_fused_mode(rng, monkeypatch):
    """The original single-kernel dx+dw tap loop (BWD_MODE='fused')."""
    import sepreformer_tpu.ops.pallas.depthwise as dw_mod
    monkeypatch.setattr(dw_mod, "BWD_MODE", "fused")
    b, t, c, k = 1, 256, 128, 65
    x = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, c)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    gk = jax.grad(lambda *a: jnp.sum(depthwise_large(*a, True) ** 2),
                  argnums=(0, 1, 2))(x, w, bias)
    gr = jax.grad(lambda *a: jnp.sum(depthwise_reference(*a) ** 2),
                  argnums=(0, 1, 2))(x, w, bias)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)
