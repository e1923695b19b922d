"""Flash rel-pos attention TRAIN kernel: fwd/bwd equivalence + dropout.

The kernel (interpret mode on CPU) must match the jnp hash-dropout
reference exactly in both the forward output and all four gradients
(dq, dk, dv, d pe_table); with p_drop=0 it must also match the
inference-path XLA reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sepreformer_tpu.ops.pallas.attention import relpos_attention_reference
from sepreformer_tpu.ops.pallas.attention_train import (
    attention_train_reference,
    flash_relpos_attention_train,
    supported_length,
)

B, H, D, MAXLEN = 2, 3, 16, 64


def _inputs(l, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v = (jnp.asarray(rng.normal(scale=0.5, size=(B, H, l, D)),
                           jnp.float32) for _ in range(3))
    pe = jnp.asarray(rng.normal(scale=0.1, size=(2 * MAXLEN, D)), jnp.float32)
    return q, k, v, pe


@pytest.mark.parametrize("l", [128, 200, 512])
@pytest.mark.parametrize("p", [0.0, 0.1])
def test_forward_matches_reference(l, p):
    q, k, v, pe = _inputs(l)
    seed = jnp.int32(1234)
    out = flash_relpos_attention_train(q, k, v, pe, seed, MAXLEN, p, True)
    ref = attention_train_reference(q, k, v, pe, MAXLEN, seed, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    if p == 0.0:
        ref2 = relpos_attention_reference(q, k, v, pe, MAXLEN)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref2),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("l", [128, 200])
@pytest.mark.parametrize("p", [0.0, 0.15])
def test_gradients_match_reference(l, p):
    q, k, v, pe = _inputs(l, seed=3)
    seed = jnp.int32(77)
    rng = np.random.default_rng(9)
    cot = jnp.asarray(rng.normal(size=(B, H, l, D)), jnp.float32)

    def f_kernel(q, k, v, pe):
        out = flash_relpos_attention_train(q, k, v, pe, seed, MAXLEN, p, True)
        return jnp.sum(out * cot)

    def f_ref(q, k, v, pe):
        out = attention_train_reference(q, k, v, pe, MAXLEN, seed, p)
        return jnp.sum(out * cot)

    g_kernel = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(q, k, v, pe)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, pe)
    for a, b, name in zip(g_kernel, g_ref, ("dq", "dk", "dv", "dpe")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=name,
        )


def test_dropout_statistics_and_determinism():
    l, p = 256, 0.25
    q, k, v, pe = _inputs(l, seed=5)
    seed = jnp.int32(42)
    a = flash_relpos_attention_train(q, k, v, pe, seed, MAXLEN, p, True)
    b = flash_relpos_attention_train(q, k, v, pe, seed, MAXLEN, p, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = flash_relpos_attention_train(q, k, v, pe, jnp.int32(43), MAXLEN, p,
                                     True)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6

    # keep fraction of the hash mask is close to 1-p
    from sepreformer_tpu.ops.pallas.gcfn_train import keep_mask

    rows = jnp.arange(l, dtype=jnp.int32)[:, None]
    cols = jnp.arange(l, dtype=jnp.int32)[None, :]
    frac = float(keep_mask(seed, 0, rows, cols, p).mean())
    assert abs(frac - (1 - p)) < 0.02, frac


def test_supported_length_gate():
    assert supported_length(500) and supported_length(512)
    assert not supported_length(513)


def test_train_step_through_kernel_matches_xla_path():
    """Full train step with attention_train_impl=pallas_interpret vs xla:
    with dropout=0 the two paths compute the same math, so losses and
    gradients must agree."""
    from dataclasses import replace

    from sepreformer_tpu.config import ModelConfig, OptimConfig, VariantConfig
    from sepreformer_tpu.engine.train import create_train_state, make_train_step

    model = ModelConfig(
        num_stages=1, num_spks=2, enc_dim=16, enc_kernel=16, enc_stride=4,
        feat_dim=16, num_heads=2, pos_maxlen=64, local_kernel=9,
        down_kernel=5, dropout=0.0,
    )
    base = VariantConfig(name="attn-train-xla", model=model,
                         optim=OptimConfig(lr=1e-3))
    pall = replace(base, model=replace(
        model, attention_train_impl="pallas_interpret"))

    t = 2000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=0.1, size=(2, t)), jnp.float32)
    s = jnp.asarray(rng.normal(scale=0.05, size=(2, 2, t)), jnp.float32)
    state = create_train_state(base, jax.random.key(0), sample_len=t)
    lr, alpha, key = jnp.float32(1e-3), jnp.float32(0.4), jax.random.key(1)

    _, m_a = make_train_step(base, donate=False, debug_grads=True)(
        state, x, s, lr, alpha, key)
    _, m_b = make_train_step(pall, donate=False, debug_grads=True)(
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
        model, dropout=0.1, attention_train_impl="pallas_interpret"))
    state_d = create_train_state(drop, jax.random.key(0), sample_len=t)
    _, m_d = make_train_step(drop, donate=False)(state_d, x, s, lr, alpha, key)
    assert np.isfinite(float(m_d["total_loss"]))
