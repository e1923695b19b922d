"""Fused GCFN kernel equivalence tests (interpreter mode on CPU)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sepreformer_tpu.ops.pallas.gcfn import (
    _fused_gcfn_impl,
    fused_gcfn,
    gcfn_reference,
    pick_block,
)


def _params(rng, f=128, hidden=None):
    hidden = hidden or 6 * f
    return (
        jnp.asarray(rng.normal(size=(f,)), jnp.float32),        # ln scale
        jnp.asarray(rng.normal(size=(f,)), jnp.float32),        # ln bias
        jnp.asarray(rng.normal(size=(f, hidden)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(hidden,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(3, hidden)) * 0.3, jnp.float32),
        jnp.asarray(rng.normal(size=(hidden,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(hidden // 2, f)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(f,)) * 0.01, jnp.float32),  # layer scale
    )


def test_pick_block():
    assert pick_block(8000) == 400
    assert pick_block(500) == 500   # full-dim block
    assert pick_block(512) == 512
    assert pick_block(1000) == 200
    assert pick_block(63) == 63     # full-dim block
    assert pick_block(1009) == 0    # prime > MAX_BLOCK
    # blocks larger than MAX must be multiples of 8 (Mosaic sublane rule)
    assert all(pick_block(t) % 8 == 0 or pick_block(t) == t
               for t in (8000, 4000, 2000, 1000, 10000))


@pytest.mark.parametrize("b,t,f", [(2, 256, 128), (1, 500, 128), (2, 384, 64)])
def test_fused_matches_reference(rng, b, t, f):
    x = jnp.asarray(rng.normal(size=(b, t, f)), jnp.float32)
    params = _params(rng, f=f)
    ref = gcfn_reference(x, params, 1e-5)
    out = _fused_gcfn_impl(x, params, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_gradients_match(rng):
    x = jnp.asarray(rng.normal(size=(1, 256, 64)), jnp.float32)
    params = _params(rng, f=64)

    g_ref = jax.grad(lambda x, p: jnp.sum(gcfn_reference(x, p, 1e-5) ** 2),
                     argnums=(0, 1))(x, params)
    g_fused = jax.grad(lambda x, p: jnp.sum(fused_gcfn(x, p, 1e-5, True) ** 2),
                       argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_full_model_fused_matches_xla():
    from sepreformer_tpu.models import SepReformer
    from test_model import tiny_cfg

    cfg_xla = tiny_cfg(fused_ffn="off")
    cfg_fused = tiny_cfg(fused_ffn="interpret")
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


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("pipe", ["auto", "off"])
def test_multiblock_eval(rng, monkeypatch, masked, pipe):
    """nt >= 2 (block-boundary halo rows), pipelined and single-shot.
    Every pre-existing shape here resolved to a single block (nt=1), so
    the bi>0/bi<nt-1 edge handling was interpret-untested."""
    import sepreformer_tpu.ops.pallas.gcfn as gk
    monkeypatch.setattr(gk, "MAX_BLOCK", 128)
    monkeypatch.setattr(gk, "MAX_BLOCK_PIPE", 128)
    b, t, f = 2, 256, 64
    assert gk.pick_block(t) == 128  # really multi-block
    assert gk.pick_block_pipe(t) == 128
    x = jnp.asarray(rng.normal(size=(b, t, f)), jnp.float32)
    params = _params(rng, f=f)
    mask = None
    if masked:
        lens = jnp.asarray([200, 256], jnp.int32)
        mask = (jnp.arange(t)[None, :, None] < lens[:, None, None]).astype(
            jnp.float32)
    ref = gcfn_reference(x, params, 1e-5, mask)
    out = _fused_gcfn_impl(x, params, 1e-5, interpret=True, mask=mask,
                           pipe=pipe)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
