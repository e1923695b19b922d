"""Fused masked-softmax·V eval kernel (ops/pallas/softmax_pv).

Standalone equivalence vs the XLA reference (masked + unmasked + vjp),
and the full-model attention_impl="fused_pv" path vs the all-XLA path
(reference softmax semantics: modules/network.py:114-121).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sepreformer_tpu.ops.pallas.softmax_pv import (
    softmax_pv,
    softmax_pv_reference,
)


@pytest.mark.parametrize("b,h,l,d", [(2, 8, 500, 16), (4, 4, 128, 32)])
@pytest.mark.parametrize("masked", [False, True])
def test_kernel_matches_reference(b, h, l, d, masked):
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(b, h, l, l)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, h * d)), jnp.float32)
    lens = (jnp.asarray(rng.integers(l // 2, l + 1, size=(b,)), jnp.int32)
            if masked else None)
    ref = softmax_pv_reference(scores, v, lens)
    got = softmax_pv(scores, v, lens, None, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_vjp_matches_reference():
    rng = np.random.default_rng(1)
    b, h, l, d = 2, 4, 128, 16
    scores = jnp.asarray(rng.normal(size=(b, h, l, l)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, h * d)), jnp.float32)
    lens = jnp.asarray([100, 128], jnp.int32)
    g = jnp.asarray(rng.normal(size=(b, l, h * d)), jnp.float32)
    ds, dv = jax.grad(
        lambda s, vv: jnp.sum(softmax_pv(s, vv, lens, None, True) * g),
        argnums=(0, 1),
    )(scores, v)
    ds2, dv2 = jax.grad(
        lambda s, vv: jnp.sum(softmax_pv_reference(s, vv, lens) * g),
        argnums=(0, 1),
    )(scores, v)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ds2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv2),
                               rtol=1e-6, atol=1e-6)


def test_two_tensor_bias_form_matches_reference():
    """The unsummed (qk, bias) kernel form — measured-and-rejected as the
    model default (blocks._fused_pv_scores docstring) but kept tested."""
    rng = np.random.default_rng(4)
    b, h, l, d = 2, 4, 128, 16
    qk = jnp.asarray(rng.normal(size=(b, h, l, l)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(b, h, l, l)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, h * d)), jnp.float32)
    lens = jnp.asarray([100, 128], jnp.int32)
    got = softmax_pv(qk, v, lens, None, True, bias)
    ref = softmax_pv_reference(qk, v, lens, None, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)
    g = jnp.asarray(rng.normal(size=(b, l, h * d)), jnp.float32)
    grads = jax.grad(
        lambda s, vv, bb: jnp.sum(softmax_pv(s, vv, lens, None, True, bb)
                                  * g),
        argnums=(0, 1, 2),
    )(qk, v, bias)
    grads_ref = jax.grad(
        lambda s, vv, bb: jnp.sum(
            softmax_pv_reference(s, vv, lens, None, bb) * g),
        argnums=(0, 1, 2),
    )(qk, v, bias)
    for a, r in zip(grads, grads_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-6, atol=1e-6)


def _model_out(impl, x, lens=None):
    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.models import SepReformer

    variant = get_variant("SepReformer_T")
    variant = dataclasses.replace(
        variant,
        model=dataclasses.replace(variant.model, attention_impl=impl),
    )
    model = SepReformer(variant.model)
    variables = model.init(jax.random.key(0), x)
    audio, _ = model.apply(variables, x, lengths=lens)
    return np.asarray(audio)


def test_full_model_fused_pv_matches_xla():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(scale=0.05, size=(2, 4000)), jnp.float32)
    a = _model_out("xla", x)
    b = _model_out("fused_pv_interpret", x)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


def test_full_model_fused_pv_masked_matches_xla():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(scale=0.05, size=(2, 4000)), jnp.float32)
    lens = jnp.asarray([3000, 4000], jnp.int32)
    a = _model_out("xla", x, lens)
    b = _model_out("fused_pv_interpret", x, lens)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_key_blocked_matches_reference(monkeypatch, masked):
    """The query+key-blocked online-softmax variant (used when the
    full-row scratch would overflow VMEM, i.e. long utterances).
    Budgets shrunk so the blocked path triggers at a test-sized Lp with
    multiple query blocks AND multiple key blocks."""
    import sepreformer_tpu.ops.pallas.softmax_pv as sp
    monkeypatch.setattr(sp, "FULL_ROW_SCRATCH_BYTES", 1)
    monkeypatch.setattr(sp, "KEY_BLOCK_SCRATCH_BYTES", 2 * 256 * 128 * 4)
    rng = np.random.default_rng(7)
    b, h, lp, d = 2, 3, 256, 16
    scores = jnp.asarray(rng.normal(size=(b, h, lp, lp)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, lp, h * d)), jnp.float32)
    t = 250
    lens = jnp.asarray([180, 250], jnp.int32) if masked else None
    # the blocked path is really on, with kb < lp (multiple key blocks)
    assert sp.pick_qk_blocks(lp, 4) == (256, 128)
    got = sp.softmax_pv(scores, v, lens, t, True)
    ref = sp.softmax_pv_reference(scores, v, lens, t)
    np.testing.assert_allclose(np.asarray(got[:, :t]),
                               np.asarray(ref[:, :t]),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_query_blocked_matches_reference(monkeypatch, masked):
    """Force lq < lp (multiple query-block grid steps) explicitly."""
    import sepreformer_tpu.ops.pallas.softmax_pv as sp
    monkeypatch.setattr(sp, "FULL_ROW_SCRATCH_BYTES", 1)
    monkeypatch.setattr(sp, "KEY_BLOCK_SCRATCH_BYTES", 2 * 256 * 128 * 4)

    monkeypatch.setattr(sp, "pick_qk_blocks", lambda lp, isz: (128, 128))
    rng = np.random.default_rng(11)
    b, h, lp, d = 1, 2, 384, 16
    scores = jnp.asarray(rng.normal(size=(b, h, lp, lp)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, lp, h * d)), jnp.float32)
    t = 380
    lens = jnp.asarray([300], jnp.int32) if masked else None
    got = sp.softmax_pv(scores, v, lens, t, True)
    ref = sp.softmax_pv_reference(scores, v, lens, t)
    np.testing.assert_allclose(np.asarray(got[:, :t]),
                               np.asarray(ref[:, :t]),
                               rtol=2e-5, atol=2e-5)
