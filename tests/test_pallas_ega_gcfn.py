"""Fused EGA-tail+GCFN pair kernel tests (interpreter mode on CPU).

The kernel (ops/pallas/ega_gcfn.py) computes the EGA tail
``x + sigmoid(Linear(LN(x))) * nearest_up(x_down)`` (network.py:126-155)
fused with the following GCFN (network.py:46-66), as used by GlobalBlock
(network.py:189-209).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sepreformer_tpu.ops.pallas.ega_gcfn import (
    _impl,
    ega_tail_gcfn_reference,
    fused_ega_tail_gcfn,
)


def _gcfn_params(rng, f, hidden=None):
    hidden = hidden or 6 * f
    return (
        jnp.asarray(rng.normal(size=(f,)), jnp.float32),
        jnp.asarray(rng.normal(size=(f,)), jnp.float32),
        jnp.asarray(rng.normal(size=(f, hidden)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(hidden,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(3, hidden)) * 0.3, jnp.float32),
        jnp.asarray(rng.normal(size=(hidden,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(hidden // 2, f)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(f,)) * 0.01, jnp.float32),
    )


def _gate_params(rng, f):
    return (
        jnp.asarray(rng.normal(size=(f,)), jnp.float32),
        jnp.asarray(rng.normal(size=(f,)), jnp.float32),
        jnp.asarray(rng.normal(size=(f, f)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize(
    "b,t,l,f",
    [
        (2, 256, 256, 64),   # bottleneck stage: r == 1
        (2, 512, 256, 64),   # r == 2
        (1, 512, 64, 128),   # r == 8, single full-length block
        (1, 1024, 128, 64),  # r == 8, multi-block (boundary rows)
        (1, 1150, 500, 64),  # non-integral upsample (full-utterance eval)
    ],
)
def test_fused_pair_matches_reference(rng, b, t, l, f):
    x = jnp.asarray(rng.normal(size=(b, t, f)), jnp.float32)
    xd = jnp.asarray(rng.normal(size=(b, l, f)), jnp.float32)
    gate = _gate_params(rng, f)
    gcfn = _gcfn_params(rng, f)
    ref = ega_tail_gcfn_reference(x, xd, gate, gcfn, 1e-5)
    out = _impl(x, xd, gate, gcfn, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_pair_gradients_match(rng):
    x = jnp.asarray(rng.normal(size=(1, 256, 64)), jnp.float32)
    xd = jnp.asarray(rng.normal(size=(1, 64, 64)), jnp.float32)
    gate = _gate_params(rng, 64)
    gcfn = _gcfn_params(rng, 64)

    def loss_ref(x, xd, gp, cp):
        return jnp.sum(ega_tail_gcfn_reference(x, xd, gp, cp, 1e-5) ** 2)

    def loss_fused(x, xd, gp, cp):
        return jnp.sum(fused_ega_tail_gcfn(x, xd, gp, cp, 1e-5, True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, xd, gate, gcfn)
    g_out = jax.grad(loss_fused, argnums=(0, 1))(x, xd, gate, gcfn)
    for a, b_ in zip(g_ref, g_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_globalblock_fused_matches_unfused(rng):
    """Module-level parity: GlobalBlock with the fused pair (interpret)
    vs the plain EGA+GCFN path, identical parameter tree."""
    from sepreformer_tpu.models.blocks import GlobalBlock, RelPos

    f, heads, t, l, maxlen = 64, 4, 256, 64, 128
    x = jnp.asarray(rng.normal(size=(2, t, f)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(2 * maxlen, f // heads)), jnp.float32)
    pos = RelPos(table=table, length=l, maxlen=maxlen, impl="xla")

    fused = GlobalBlock(f, heads, 0.0, fused_ffn="off", fused_pair="interpret")
    plain = GlobalBlock(f, heads, 0.0, fused_ffn="off", fused_pair="off")
    params = fused.init(jax.random.PRNGKey(0), x, pos)
    # identical parameter tree -> the unfused module accepts the same params
    out_f = fused.apply(params, x, pos)
    out_p = plain.apply(params, x, pos)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-5, atol=2e-5)
