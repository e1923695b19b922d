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


def test_engine_forces_xla_paths_under_model_axis(tmp_path):
    """With model_parallel_size > 1 the Engine pins every fused-kernel
    knob to its XLA path: pallas_call operands have no partitioning rule
    under a model-sharded pjit, so the policy must be explicit (round-1
    verdict item)."""
    from dataclasses import replace

    from sepreformer_tpu.engine.engine import Engine

    cfg = tiny_variant()
    cfg = replace(cfg, sharding=replace(cfg.sharding,
                                        model_parallel_size=2))
    mesh = create_mesh(data=2, model=2)
    eng = Engine(cfg, str(tmp_path / "w"), {}, mesh=mesh)
    m = eng.cfg.model
    assert (m.fused_ffn, m.fused_local, m.fused_pair,
            m.fused_depthwise) == ("off",) * 4
    assert m.attention_impl == "xla" and m.attention_train_impl == "xla"

    # data-parallel-only meshes keep the measured kernel defaults
    cfg2 = tiny_variant()
    eng2 = Engine(cfg2, str(tmp_path / "w2"), {},
                  mesh=create_mesh(data=4, model=1))
    assert eng2.cfg.model.fused_ffn == "auto"


def test_sharded_checkpoint_restore_into_mesh(tmp_path):
    """A model-sharded TrainState round-trips through orbax: save while
    sharded over a (2,2) mesh, restore into a fresh Engine, re-shard —
    leaves identical and the q kernel distributed again."""
    from dataclasses import replace

    from sepreformer_tpu.engine.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from sepreformer_tpu.engine.engine import Engine

    cfg = replace(tiny_variant(),
                  sharding=replace(tiny_variant().sharding,
                                   model_parallel_size=2))
    mesh = create_mesh(data=2, model=2)
    eng = Engine(cfg, str(tmp_path / "w"), {}, mesh=mesh, seed=3)
    host_before = jax.device_get(eng.state.params)
    save_checkpoint(eng.ckpt_dir, 7, eng.state,
                    extra={"lr_ctl": {"lr": 1e-3}})

    eng2 = Engine(cfg, str(tmp_path / "w"), {}, mesh=mesh, seed=9)
    assert eng2.start_epoch == 8  # resumed from epoch 7
    q = eng2.state.params["separator"]["enc_0"]["global_1"]["ega"]["attn"]["q"]["kernel"]
    assert len(q.sharding.device_set) >= 2
    for a, b in zip(jax.tree.leaves(host_before),
                    jax.tree.leaves(jax.device_get(eng2.state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
