"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sepreformer_tpu.config import ModelConfig, VariantConfig
from sepreformer_tpu.engine.train import create_train_state, make_train_step
from sepreformer_tpu.parallel.mesh import (
    batch_spec,
    create_mesh,
    param_specs,
    shard_train_state,
    sources_spec,
)


def tiny_variant():
    return VariantConfig(
        name="tiny",
        model=ModelConfig(
            num_stages=2, num_spks=2, enc_dim=32, enc_kernel=16, enc_stride=4,
            feat_dim=32, num_heads=4, pos_maxlen=64, local_kernel=9,
            down_kernel=5, dropout=0.1,
        ),
    )


def test_create_mesh_shapes():
    mesh = create_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = create_mesh(model=2)  # data inferred
    assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())


def test_param_specs_shard_wide_dims():
    cfg = tiny_variant()
    state = create_train_state(cfg, jax.random.key(0), sample_len=800)
    specs = param_specs(state.params, model_size=2)
    q = specs["separator"]["enc_0"]["global_1"]["ega"]["attn"]["q"]["kernel"]
    assert q == P(None, "model")
    out = specs["separator"]["enc_0"]["global_1"]["ega"]["attn"]["out"]["kernel"]
    assert out == P("model", None)
    gcfn_in = specs["separator"]["enc_0"]["global_1"]["gcfn"]["proj_in"]["kernel"]
    assert gcfn_in == P(None, "model")
    # encoder kernel replicated
    assert specs["audio_encoder"]["kernel"] == P()


def test_data_parallel_train_step_matches_single_device():
    """One train step on a (4,1) mesh must equal the unsharded step."""
    cfg = tiny_variant()
    rng = np.random.default_rng(0)
    mixture = jnp.asarray(rng.normal(scale=0.1, size=(4, 800)), jnp.float32)
    sources = jnp.asarray(rng.normal(scale=0.05, size=(2, 4, 800)), jnp.float32)
    lr, alpha = jnp.float32(1e-3), jnp.float32(0.4)
    key = jax.random.key(1)

    state0 = create_train_state(cfg, jax.random.key(0), sample_len=800)
    step = make_train_step(cfg, donate=False)
    ref_state, ref_metrics = step(state0, mixture, sources, lr, alpha, key)

    mesh = create_mesh(data=4, model=1)
    state_sh = shard_train_state(
        create_train_state(cfg, jax.random.key(0), sample_len=800), mesh, 1
    )
    mix_sh = jax.device_put(mixture, NamedSharding(mesh, batch_spec()))
    src_sh = jax.device_put(sources, NamedSharding(mesh, sources_spec()))
    sh_state, sh_metrics = step(state_sh, mix_sh, src_sh, lr, alpha, key)

    np.testing.assert_allclose(
        float(ref_metrics["total_loss"]), float(sh_metrics["total_loss"]),
        rtol=2e-4,
    )
    # parameters stay numerically equivalent after the update
    ref_leaf = np.asarray(
        jax.tree.leaves(ref_state.params)[0]
    )
    sh_leaf = np.asarray(jax.tree.leaves(sh_state.params)[0])
    np.testing.assert_allclose(ref_leaf, sh_leaf, rtol=1e-4, atol=1e-6)


def test_model_parallel_train_step_runs():
    """(2,2) mesh with model-axis sharding executes and stays finite."""
    cfg = tiny_variant()
    mesh = create_mesh(data=2, model=2)
    state = shard_train_state(
        create_train_state(cfg, jax.random.key(0), sample_len=800), mesh, 2
    )
    rng = np.random.default_rng(0)
    mix = jax.device_put(
        jnp.asarray(rng.normal(scale=0.1, size=(4, 800)), jnp.float32),
        NamedSharding(mesh, batch_spec()),
    )
    src = jax.device_put(
        jnp.asarray(rng.normal(scale=0.05, size=(2, 4, 800)), jnp.float32),
        NamedSharding(mesh, sources_spec()),
    )
    step = make_train_step(cfg, donate=False)
    new_state, metrics = step(
        state, mix, src, jnp.float32(1e-3), jnp.float32(0.4), jax.random.key(1)
    )
    assert np.isfinite(float(metrics["total_loss"]))
    # sharded q kernel really is distributed over the model axis
    q = new_state.params["separator"]["enc_0"]["global_1"]["ega"]["attn"]["q"]["kernel"]
    assert len(q.sharding.device_set) >= 2
