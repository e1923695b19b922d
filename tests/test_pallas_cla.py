"""Fused CLA kernel equivalence tests (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sepreformer_tpu.ops.pallas.cla import (
    _fused_cla_impl,
    cla_reference,
    fused_cla,
    pick_block,
)


def _params(rng, f=128, k=65):
    h = 2 * f
    return (
        jnp.asarray(rng.normal(size=(f,)), jnp.float32),         # ln scale
        jnp.asarray(rng.normal(size=(f,)), jnp.float32),         # ln bias
        jnp.asarray(rng.normal(size=(f, h)) * 0.1, jnp.float32),  # w_in
        jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(k, f)) * 0.1, jnp.float32),  # wdw
        jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(f, h)) * 0.1, jnp.float32),  # w_mid
        jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32),
        jnp.asarray(1.0 + 0.1 * rng.normal(size=(h,)), jnp.float32),  # bn_s
        jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32),        # bn_t
        jnp.asarray(rng.normal(size=(h, f)) * 0.1, jnp.float32),  # w_out
        jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(f,)) * 0.01, jnp.float32),   # ls
    )


def test_pick_block():
    assert pick_block(8000, 128) == 400
    assert pick_block(500, 128) == 500   # full-dim block
    assert pick_block(512, 128) == 512
    assert pick_block(1000, 128) == 200
    assert pick_block(1009, 128) == 0    # prime > MAX_BLOCK


# multi-block cases exercise the halo recompute and the sequence-edge
# v-space zero masking (first/last blocks have out-of-range halo rows)
@pytest.mark.parametrize(
    "b,t,f,k", [(2, 256, 128, 65), (1, 500, 128, 65), (2, 768, 64, 65),
                (1, 320, 64, 5)]
)
def test_fused_matches_reference(rng, b, t, f, k):
    x = jnp.asarray(rng.normal(size=(b, t, f)), jnp.float32)
    params = _params(rng, f=f, k=k)
    ref = cla_reference(x, params, 1e-5)
    out = _fused_cla_impl(x, params, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_multiblock_matches_singleblock(rng):
    """The blocked kernel (t > MAX_BLOCK -> several halo blocks) must agree
    with the reference at block boundaries."""
    x = jnp.asarray(rng.normal(size=(1, 1024, 64)), jnp.float32)
    params = _params(rng, f=64)
    ref = cla_reference(x, params, 1e-5)
    out = _fused_cla_impl(x, params, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_gradients_match(rng):
    x = jnp.asarray(rng.normal(size=(1, 256, 64)), jnp.float32)
    params = _params(rng, f=64)
    g_ref = jax.grad(lambda x, p: jnp.sum(cla_reference(x, p, 1e-5) ** 2),
                     argnums=(0, 1))(x, params)
    g_fused = jax.grad(lambda x, p: jnp.sum(fused_cla(x, p, 1e-5, True) ** 2),
                       argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_full_model_fused_matches_xla():
    """Model with fused_local=interpret == fused_local=off (eval mode)."""
    from sepreformer_tpu.models import SepReformer
    from test_model import tiny_cfg

    cfg_xla = tiny_cfg(fused_local="off")
    cfg_fused = tiny_cfg(fused_local="interpret")
    x = jnp.asarray(
        np.random.default_rng(0).normal(scale=0.1, size=(1, 1600)), jnp.float32
    )
    m_xla, m_fused = SepReformer(cfg_xla), SepReformer(cfg_fused)
    variables = m_xla.init(jax.random.key(0), x)
    a_xla, aux_xla = m_xla.apply(variables, x)
    a_fused, aux_fused = m_fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(a_fused), np.asarray(a_xla),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_fused), np.asarray(aux_xla),
                               rtol=1e-4, atol=1e-5)


def test_bn_running_stats_unchanged():
    """FoldableBatchNorm must update batch_stats exactly like nn.BatchNorm
    did (flax semantics: biased variance, momentum 0.9)."""
    from flax import linen as nn

    from sepreformer_tpu.models.blocks import FoldableBatchNorm

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 50, 16)), jnp.float32)
    mine = FoldableBatchNorm(16, momentum=0.9, epsilon=1e-5)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v_mine = mine.init(jax.random.key(0), x, use_running_average=False)
    v_ref = ref.init(jax.random.key(0), x)
    y_mine, upd_mine = mine.apply(v_mine, x, use_running_average=False,
                                  mutable=["batch_stats"])
    y_ref, upd_ref = ref.apply(v_ref, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_mine), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree.leaves(upd_mine), jax.tree.leaves(upd_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
