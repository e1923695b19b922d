"""Layout-pinned Pallas pos_kt materializer (ops/pallas/relpos.py).

Equivalence vs the XLA gather (`gather_pos_kt`), the table gradient, and
the full-model forward with the knob flipped — the tensor feeds the bias
einsum of every XLA-path global block (reference math:
modules/network.py:106-113, clamp modules/module.py:53-54).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sepreformer_tpu.models.blocks import gather_pos_kt
from sepreformer_tpu.ops.pallas.relpos import (
    materialize_pos_kt,
    resolve_relpos_materializer,
)


@pytest.mark.parametrize(
    "t,maxlen", [(500, 2000), (512, 2000), (128, 100), (250, 125), (64, 32)]
)
def test_matches_gather(t, maxlen):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(2 * maxlen, 16)), jnp.float32)
    ref = gather_pos_kt(table, t, maxlen)
    got = materialize_pos_kt(table, t, maxlen, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_table_gradient_matches_gather():
    rng = np.random.default_rng(1)
    t, maxlen = 128, 100
    table = jnp.asarray(rng.normal(size=(2 * maxlen, 16)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(t, 16, t)), jnp.float32)

    def loss_pallas(tab):
        return jnp.sum(materialize_pos_kt(tab, t, maxlen, True) * g)

    def loss_gather(tab):
        return jnp.sum(gather_pos_kt(tab, t, maxlen) * g)

    dp = jax.grad(loss_pallas)(table)
    dg = jax.grad(loss_gather)(table)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dg),
                               rtol=1e-6, atol=1e-6)


def test_resolver():
    assert resolve_relpos_materializer("gather") == "gather"
    assert resolve_relpos_materializer("pallas") == "pallas"
    assert resolve_relpos_materializer("auto") in ("gather", "pallas")


def test_full_model_forward_equal():
    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.models import SepReformer

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(scale=0.05, size=(1, 4000)), jnp.float32)
    outs = {}
    for mat in ("gather", "pallas_interpret"):
        variant = get_variant("SepReformer_T")
        variant = dataclasses.replace(
            variant,
            model=dataclasses.replace(
                variant.model, relpos_materializer=mat,
            ),
        )
        model = SepReformer(variant.model)
        variables = model.init(jax.random.key(0), x)
        audio, _ = model.apply(variables, x)
        outs[mat] = np.asarray(audio)
    np.testing.assert_allclose(outs["pallas_interpret"], outs["gather"],
                               rtol=1e-6, atol=1e-6)
