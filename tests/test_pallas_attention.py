"""Equivalence tests: Pallas flash rel-pos attention vs XLA reference.

Runs in interpreter mode on CPU (real-TPU execution is exercised by
bench.py / the driver).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sepreformer_tpu.ops.pallas.attention import (
    _flash_relpos_attention_impl,
    relpos_attention_reference,
)


def _rand_qkvpe(rng, b=2, h=2, l=200, d=16, maxlen=256):
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(2 * maxlen, d)), jnp.float32)
    return q, k, v, pe


@pytest.mark.parametrize("l", [128, 200, 256, 384, 500])
def test_flash_matches_reference(rng, l):
    q, k, v, pe = _rand_qkvpe(rng, l=l, maxlen=512)
    out = _flash_relpos_attention_impl(q, k, v, pe, 512, interpret=True)
    ref = relpos_attention_reference(q, k, v, pe, 512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("block", [128, 256])
def test_flash_forced_block_matches_reference(rng, block):
    """Multi-block online-softmax path at a length where auto would pick a
    single full-length block."""
    q, k, v, pe = _rand_qkvpe(rng, l=500, maxlen=512)
    out = _flash_relpos_attention_impl(q, k, v, pe, 512, interpret=True,
                                       block=block)
    ref = relpos_attention_reference(q, k, v, pe, 512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_matches_reference_with_clamp(rng):
    """maxlen < L exercises the rel-index clamp (module.py:53-54)."""
    l, maxlen = 300, 64
    q, k, v, pe = _rand_qkvpe(rng, l=l, maxlen=maxlen)
    out = _flash_relpos_attention_impl(q, k, v, pe, maxlen, interpret=True)
    ref = relpos_attention_reference(q, k, v, pe, maxlen)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_gradient_matches_reference(rng):
    from sepreformer_tpu.ops.pallas.attention import flash_relpos_attention

    q, k, v, pe = _rand_qkvpe(rng, b=1, h=2, l=128, d=16, maxlen=128)

    def loss_flash(q, k, v, pe):
        return jnp.sum(flash_relpos_attention(q, k, v, pe, 128, True) ** 2)

    def loss_ref(q, k, v, pe):
        return jnp.sum(relpos_attention_reference(q, k, v, pe, 128) ** 2)

    # the custom_vjp backward is the reference vjp; check it end-to-end
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, pe)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, pe)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
