"""Train-mode fused softmax·dropout·V (ops/pallas/softmax_pv_train).

Standalone fwd/bwd equivalence vs the hash-dropout jnp reference, the
dropout statistics, and the full train step through
attention_train_impl="fused_pv_interpret" vs the XLA path at dropout 0
(identical math -> identical losses and gradients; reference dropout
site: modules/network.py:114-124).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sepreformer_tpu.ops.pallas.softmax_pv_train import (
    softmax_pv_dropout,
    softmax_pv_dropout_reference,
    supported_length,
)


def _inputs(b=2, h=4, lp=128, d=16, seed=0):
    rng = np.random.default_rng(seed)
    scores = jnp.asarray(rng.normal(size=(b, h, lp, lp)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, lp, h * d)), jnp.float32)
    return scores, v


@pytest.mark.parametrize("p", [0.0, 0.2])
@pytest.mark.parametrize("masked", [False, True])
def test_forward_matches_reference(p, masked):
    scores, v = _inputs()
    t, seed = 100, jnp.int32(77)
    lens = jnp.asarray([60, 90], jnp.int32) if masked else None
    got = softmax_pv_dropout(scores, v, seed, lens, t, p, True)
    ref = softmax_pv_dropout_reference(scores, v, seed, lens, t, p)
    np.testing.assert_allclose(np.asarray(got[:, :t]),
                               np.asarray(ref[:, :t]),
                               rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("p", [0.0, 0.2])
def test_gradients_match_reference(p):
    scores, v = _inputs(seed=1)
    t, seed = 100, jnp.int32(5)
    g = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, t, 64)), jnp.float32)

    def run(fn):
        return jax.grad(
            lambda s, vv: jnp.sum(fn(s, vv)[:, :t] * g), argnums=(0, 1)
        )(scores, v)

    ds, dv = run(lambda s, vv: softmax_pv_dropout(
        s, vv, seed, None, t, p, True))
    ds2, dv2 = run(lambda s, vv: softmax_pv_dropout_reference(
        s, vv, seed, None, t, p))
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ds2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv2),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("p", [0.0, 0.2])
def test_two_tensor_bias_form_matches_reference(p):
    """Unsummed (qk, bias) form incl. gradients — dScores doubles as the
    bias cotangent (the add distributes it)."""
    scores, v = _inputs(seed=4)
    bias = jnp.asarray(
        np.random.default_rng(5).normal(size=scores.shape), jnp.float32)
    t, seed = 100, jnp.int32(11)
    got = softmax_pv_dropout(scores, v, seed, None, t, p, True, bias)
    ref = softmax_pv_dropout_reference(scores, v, seed, None, t, p, bias)
    np.testing.assert_allclose(np.asarray(got[:, :t]),
                               np.asarray(ref[:, :t]),
                               rtol=2e-6, atol=2e-6)
    g = jnp.asarray(
        np.random.default_rng(6).normal(size=(2, t, 64)), jnp.float32)
    gk = jax.grad(
        lambda s, vv, bb: jnp.sum(
            softmax_pv_dropout(s, vv, seed, None, t, p, True, bb)[:, :t]
            * g),
        argnums=(0, 1, 2),
    )(scores, v, bias)
    gr = jax.grad(
        lambda s, vv, bb: jnp.sum(
            softmax_pv_dropout_reference(s, vv, seed, None, t, p,
                                         bb)[:, :t] * g),
        argnums=(0, 1, 2),
    )(scores, v, bias)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)


def test_dropout_statistics_and_determinism():
    scores, v = _inputs(b=1, h=8, lp=256, seed=3)
    seed = jnp.int32(99)
    a = softmax_pv_dropout(scores, v, seed, None, 256, 0.3, True)
    b = softmax_pv_dropout(scores, v, seed, None, 256, 0.3, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a different seed must change the mask
    c = softmax_pv_dropout(scores, v, jnp.int32(100), None, 256, 0.3, True)
    assert float(jnp.abs(a - c).max()) > 0.0


def test_supported_length_gate():
    assert supported_length(512)
    assert not supported_length(640)


def test_train_step_through_fused_pv_matches_xla_path():
    """Full train step with attention_train_impl=fused_pv_interpret vs
    xla at dropout 0: same math -> same losses and gradients."""
    from dataclasses import replace

    from sepreformer_tpu.config import (
        ModelConfig,
        OptimConfig,
        VariantConfig,
    )
    from sepreformer_tpu.engine.train import (
        create_train_state,
        make_train_step,
    )

    model = ModelConfig(
        num_stages=1, num_spks=2, enc_dim=16, enc_kernel=16, enc_stride=4,
        feat_dim=16, num_heads=2, pos_maxlen=64, local_kernel=9,
        down_kernel=5, dropout=0.0,
    )
    base = VariantConfig(name="attn-train-xla", model=model,
                         optim=OptimConfig(lr=1e-3))
    fpv = replace(base, model=replace(
        model, attention_train_impl="fused_pv_interpret"))

    t = 2000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=0.1, size=(2, t)), jnp.float32)
    s = jnp.asarray(rng.normal(scale=0.05, size=(2, 2, t)), jnp.float32)
    state = create_train_state(base, jax.random.key(0), sample_len=t)
    lr, alpha, key = jnp.float32(1e-3), jnp.float32(0.4), jax.random.key(1)

    _, m_a = make_train_step(base, donate=False, debug_grads=True)(
        state, x, s, lr, alpha, key)
    _, m_b = make_train_step(fpv, donate=False, debug_grads=True)(
        state, x, s, lr, alpha, key)
    np.testing.assert_allclose(float(m_a["total_loss"]),
                               float(m_b["total_loss"]), rtol=1e-5)
    norm = float(m_a["grad_norm"])
    for a, b in zip(jax.tree.leaves(m_a["grads"]),
                    jax.tree.leaves(m_b["grads"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5 * norm)

    # with dropout on, the kernel path must run and produce finite loss
    drop = replace(base, model=replace(
        model, dropout=0.1, attention_train_impl="fused_pv_interpret"))
    state_d = create_train_state(drop, jax.random.key(0), sample_len=t)
    _, m_d = make_train_step(drop, donate=False)(
        state_d, x, s, lr, alpha, key)
    assert np.isfinite(float(m_d["total_loss"]))


def test_gradients_bf16_stream(rng=None):
    """bf16 scores/v (the Large policy): the bwd emits bf16-truncated
    cotangents by design (softmax_pv_train._bwd_impl casts to the storage
    dtypes before accumulation) — compare against an f32 reference with
    bf16-appropriate tolerances (r4 advisor: bf16 train-gradient quality
    was unvalidated)."""
    nprng = np.random.default_rng(11)
    b, h, lp, d = 2, 4, 128, 16
    scores32 = jnp.asarray(nprng.normal(size=(b, h, lp, lp)), jnp.float32)
    v32 = jnp.asarray(nprng.normal(size=(b, lp, h * d)), jnp.float32)
    scores = scores32.astype(jnp.bfloat16)
    v = v32.astype(jnp.bfloat16)
    t, seed, p = 100, jnp.int32(5), 0.2
    g = jnp.asarray(nprng.normal(size=(b, t, h * d)), jnp.float32)

    ds, dv = jax.grad(
        lambda s, vv: jnp.sum(
            softmax_pv_dropout(s, vv, seed, None, t, p, True).astype(
                jnp.float32)[:, :t] * g),
        argnums=(0, 1),
    )(scores, v)
    # reference runs the same truncated inputs in f32 end-to-end
    ds_r, dv_r = jax.grad(
        lambda s, vv: jnp.sum(
            softmax_pv_dropout_reference(
                s.astype(jnp.float32), vv.astype(jnp.float32), seed, None,
                t, p)[:, :t] * g),
        argnums=(0, 1),
    )(scores, v)
    assert ds.dtype == scores.dtype and dv.dtype == v.dtype
    # bf16 has ~3 decimal digits; dominant error is the bf16 cotangent cast
    np.testing.assert_allclose(np.asarray(ds, np.float32),
                               np.asarray(ds_r, np.float32),
                               rtol=0.05, atol=0.02)
    np.testing.assert_allclose(np.asarray(dv, np.float32),
                               np.asarray(dv_r, np.float32),
                               rtol=0.05, atol=0.02)
