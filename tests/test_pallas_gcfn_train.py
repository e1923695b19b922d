"""Fused train-mode GCFN (hash dropout + handwritten backward) tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sepreformer_tpu.ops.pallas.gcfn import gcfn_reference
from sepreformer_tpu.ops.pallas.gcfn_train import (
    _fwd_train_impl,
    fused_gcfn_train,
    gcfn_train_reference,
    keep_mask,
)

from test_pallas_gcfn import _params


SEED = jnp.int32(12345)


def test_keep_mask_statistics(rng):
    rows = jnp.arange(512, dtype=jnp.int32)[:, None]
    cols = jnp.arange(384, dtype=jnp.int32)[None, :]
    for p in (0.05, 0.5):
        m = np.asarray(keep_mask(SEED, 0, rows, cols, p))
        assert abs(m.mean() - (1 - p)) < 0.01
    # different sites/seeds decorrelate
    m0 = np.asarray(keep_mask(SEED, 0, rows, cols, 0.5))
    m1 = np.asarray(keep_mask(SEED, 1, rows, cols, 0.5))
    assert 0.4 < (m0 == m1).mean() < 0.6


@pytest.mark.parametrize("p", [0.0, 0.05, 0.3])
def test_fwd_matches_reference(rng, p):
    x = jnp.asarray(rng.normal(size=(2, 256, 128)), jnp.float32)
    params = _params(rng, f=128)
    ref = gcfn_train_reference(x, params, 1e-5, SEED, p)
    out = _fwd_train_impl(x, params, SEED, 1e-5, p, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_p0_matches_inference_reference(rng):
    x = jnp.asarray(rng.normal(size=(1, 256, 64)), jnp.float32)
    params = _params(rng, f=64)
    ref = gcfn_reference(x, params, 1e-5)
    out = _fwd_train_impl(x, params, SEED, 1e-5, 0.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("p", [0.0, 0.1])
def test_gradients_match_reference(rng, p):
    x = jnp.asarray(rng.normal(size=(1, 256, 64)), jnp.float32)
    params = _params(rng, f=64)

    def loss_k(x, params):
        return jnp.sum(fused_gcfn_train(x, params, SEED, 1e-5, p, True) ** 2)

    def loss_r(x, params):
        return jnp.sum(gcfn_train_reference(x, params, 1e-5, SEED, p) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(x, params)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, params)
    for a, r in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("pipe", ["auto", "off"])
def test_multiblock_boundary_gradients(rng, monkeypatch, pipe):
    """Gradients across conv block boundaries (t > block size), for both
    the pipelined and single-shot kernels.

    The original version patched gcfn.MAX_BLOCK, but pick_train_block
    binds MAX_BLOCK by value at import — bt stayed 256 = t and nt was 1,
    so the block-boundary path was never exercised.  Shrinking the VMEM
    budget forces bt=128 (nt=2) for real."""
    import sepreformer_tpu.ops.pallas.gcfn_train as gt

    # cap = BUDGET // (hidden*4*LIVE_ROWS) -> 128 rows at hidden=384
    monkeypatch.setattr(gt, "TRAIN_VMEM_BUDGET",
                        128 * 384 * 4 * gt.TRAIN_LIVE_ROWS)
    x = jnp.asarray(rng.normal(size=(1, 256, 64)), jnp.float32)
    params = _params(rng, f=64)
    assert gt.pick_train_block(256, 384) == 128  # really multi-block

    def loss_k(x, params):
        return jnp.sum(
            fused_gcfn_train(x, params, SEED, 1e-5, 0.1, True, pipe) ** 2
        )

    def loss_r(x, params):
        return jnp.sum(
            gcfn_train_reference(x, params, 1e-5, SEED, 0.1) ** 2
        )

    gk_grads = jax.grad(loss_k, argnums=(0, 1))(x, params)
    gr_grads = jax.grad(loss_r, argnums=(0, 1))(x, params)
    for a, r in zip(jax.tree.leaves(gk_grads), jax.tree.leaves(gr_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-3, atol=2e-4)


def test_gcfn_module_train_path_interpret(rng):
    """GCFN module routes train+dropout to the fused train kernel and
    gradients flow (interpret mode)."""
    from sepreformer_tpu.models.blocks import GCFN

    x = jnp.asarray(rng.normal(size=(1, 256, 64)), jnp.float32)
    mod = GCFN(64, dropout=0.1, fused="interpret")
    variables = mod.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=True,
    )

    def loss(params, x):
        out = mod.apply(
            {"params": params}, x, train=True,
            rngs={"dropout": jax.random.key(2)},
        )
        return jnp.sum(out ** 2)

    val, grads = jax.value_and_grad(loss)(variables["params"], x)
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)
