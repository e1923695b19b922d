"""bfloat16 compute-policy tests."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from sepreformer_tpu.models import SepReformer

from test_model import tiny_cfg


def test_bf16_forward_close_to_f32():
    cfg32 = tiny_cfg()
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    x = jnp.asarray(
        np.random.default_rng(0).normal(scale=0.1, size=(1, 1600)), jnp.float32
    )
    m32, m16 = SepReformer(cfg32), SepReformer(cfg16)
    variables = m32.init(jax.random.key(0), x)
    a32, _ = m32.apply(variables, x)
    a16, _ = m16.apply(variables, x)
    assert a16.dtype == jnp.float32  # outputs cast back
    # bf16 ~3 decimal digits; outputs are small (layer-scaled residuals)
    err = float(jnp.max(jnp.abs(a16 - a32)))
    scale = float(jnp.max(jnp.abs(a32))) + 1e-9
    assert err / scale < 0.1, f"relative err {err/scale}"


def test_bf16_params_stay_f32():
    cfg16 = dataclasses.replace(tiny_cfg(), compute_dtype="bfloat16")
    model = SepReformer(cfg16)
    x = jnp.zeros((1, 800), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    dtypes = {v.dtype for v in jax.tree.leaves(variables["params"])}
    assert dtypes == {np.dtype("float32")}
