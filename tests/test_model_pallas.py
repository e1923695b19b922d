"""Full-model equivalence: Pallas attention path vs XLA path."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from sepreformer_tpu.config import ModelConfig
from sepreformer_tpu.models import SepReformer

from test_model import tiny_cfg


def test_model_forward_pallas_matches_xla():
    cfg_xla = tiny_cfg(attention_impl="xla")
    cfg_pl = dataclasses.replace(cfg_xla, attention_impl="pallas_interpret")
    x = jnp.asarray(
        np.random.default_rng(0).normal(scale=0.1, size=(1, 1600)), jnp.float32
    )
    model_xla = SepReformer(cfg_xla)
    variables = model_xla.init(jax.random.key(0), x)
    audio_xla, aux_xla = model_xla.apply(variables, x)
    model_pl = SepReformer(cfg_pl)
    audio_pl, aux_pl = model_pl.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(audio_pl), np.asarray(audio_xla), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(aux_pl), np.asarray(aux_xla), rtol=1e-4, atol=1e-5
    )


def test_model_forward_single_matches_xla():
    """attention_impl="single": the single-block train kernel's forward
    (dropout 0) serving eval must reproduce the dense XLA path."""
    cfg_xla = tiny_cfg(attention_impl="xla")
    cfg_sg = dataclasses.replace(cfg_xla, attention_impl="single_interpret")
    x = jnp.asarray(
        np.random.default_rng(1).normal(scale=0.1, size=(2, 1600)), jnp.float32
    )
    model_xla = SepReformer(cfg_xla)
    variables = model_xla.init(jax.random.key(0), x)
    audio_xla, aux_xla = model_xla.apply(variables, x)
    model_sg = SepReformer(cfg_sg)
    audio_sg, aux_sg = model_sg.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(audio_sg), np.asarray(audio_xla), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(aux_sg), np.asarray(aux_xla), rtol=1e-4, atol=1e-5
    )
