"""Model shape/structure tests (tiny configs for CPU speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sepreformer_tpu.config import ModelConfig, get_variant
from sepreformer_tpu.models import SepReformer


def tiny_cfg(**kw):
    base = dict(
        num_stages=2, num_spks=2, enc_dim=16, enc_kernel=16, enc_stride=4,
        feat_dim=16, num_heads=2, pos_maxlen=64, local_kernel=9, down_kernel=5,
        dropout=0.0,
    )
    base.update(kw)
    return ModelConfig(**base)


def test_forward_shapes():
    cfg = tiny_cfg()
    model = SepReformer(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 800)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    audio, aux = model.apply(variables, x)
    assert audio.shape == (cfg.num_spks, 2, 800)
    assert aux.shape == (cfg.num_stages, cfg.num_spks, 2, 800)
    assert np.isfinite(np.asarray(audio)).all()


def test_frames_math():
    cfg = tiny_cfg()
    assert cfg.frames_for_samples(800) == (800 - 16) // 4 + 1
    assert cfg.padded_frames(197) == 200  # multiple of 2**2
    assert cfg.padded_frames(200) == 200  # already divisible: no pad


def test_train_mode_runs_with_dropout_and_bn():
    cfg = tiny_cfg(dropout=0.1)
    model = SepReformer(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 800)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    (audio, aux), mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    assert audio.shape == (2, 2, 800)


def test_base_param_count_matches_paper():
    """SepReformer-B is 14.2M params (BASELINE.md / paper result table)."""
    cfg = get_variant("SepReformer_Base_WSJ0").model
    model = SepReformer(cfg)
    x = jnp.zeros((1, 1600), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    n = sum(np.prod(v.shape) for v in jax.tree.leaves(variables["params"]))
    assert 13.5e6 < n < 15.0e6, f"param count {n}"


def test_per_stage_spk_split_variant():
    cfg = tiny_cfg(per_stage_spk_split=True)
    model = SepReformer(cfg)
    x = jnp.zeros((1, 800), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    names = set(variables["params"]["separator"].keys())
    assert "spk_split_0" in names and "spk_split_2" in names
    assert "spk_split" not in names


def test_relpos_bias_skew_matches_gather():
    """The skewing reshape must equal the naive [t,t,d]-gather bias."""
    import numpy as np
    import jax.numpy as jnp
    from sepreformer_tpu.models.blocks import rel_table, relpos_bias_skew

    rng = np.random.default_rng(3)
    b, t, h, d, maxlen = 2, 7, 2, 4, 5  # t-1 > maxlen exercises the clamp
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(2 * maxlen, d)), jnp.float32)
    pe_rel = rel_table(table, t, maxlen)
    got = relpos_bias_skew(q, pe_rel)

    pos = np.arange(t)
    rel = np.clip(pos[:, None] - pos[None, :], -maxlen, maxlen - 1) + maxlen
    pos_k = jnp.take(table, jnp.asarray(rel, jnp.int32), axis=0)
    want = jnp.einsum("bihd,ijd->bhij", q, pos_k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # t == 1 degenerate case
    got1 = relpos_bias_skew(q[:, :1], rel_table(table, 1, maxlen))
    want1 = jnp.einsum("bihd,ijd->bhij", q[:, :1],
                       jnp.take(table, jnp.asarray([[maxlen]]), axis=0))
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                               rtol=1e-5, atol=1e-5)


def test_relpos_barrier_equivalence():
    """relpos_barrier=on must not change outputs (it is a pure XLA
    scheduling hint around the materialized pos_kt)."""
    from dataclasses import replace

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sepreformer_tpu.config import ModelConfig
    from sepreformer_tpu.models import SepReformer

    cfg = ModelConfig(
        num_stages=2, num_spks=2, enc_dim=32, enc_kernel=16, enc_stride=4,
        feat_dim=32, num_heads=4, pos_maxlen=128, local_kernel=17,
        down_kernel=5, dropout=0.0, attention_impl="xla",
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4000)), jnp.float32)
    model = SepReformer(cfg)
    variables = jax.jit(model.init)(jax.random.key(0), x)
    audio, _ = jax.jit(model.apply)(variables, x)

    model_b = SepReformer(replace(cfg, relpos_barrier="on"))
    audio_b, _ = jax.jit(model_b.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(audio), np.asarray(audio_b),
                               rtol=0, atol=1e-6)


def test_embed_v_parameter_parity():
    """embed_v=True creates the pe_v table (reference module.py:50) and it
    converts in both directions — while leaving every output unchanged,
    because the reference's attention math never consumes pe_v (MHA takes
    pos_k only, network.py:90-113)."""
    from sepreformer_tpu.models.convert import (
        convert_torch_state_dict,
        export_torch_state_dict,
    )

    cfg_v = tiny_cfg(embed_v=True)
    cfg_plain = tiny_cfg()
    model_v = SepReformer(cfg_v)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 800)), jnp.float32
    )
    variables = jax.jit(model_v.init)(jax.random.key(0), x)
    pe_v = variables["params"]["separator"]["pos_emb"]["pe_v"]
    assert pe_v.shape == (2 * cfg_v.pos_maxlen, cfg_v.head_dim)

    # output identical to the embed_v=False model on the same params
    out_v, _ = model_v.apply(variables, x)
    import flax
    params_plain = flax.core.unfreeze(variables["params"])
    del params_plain["separator"]["pos_emb"]["pe_v"]
    out_p, _ = SepReformer(cfg_plain).apply(
        {"params": params_plain, "batch_stats": variables["batch_stats"]}, x
    )
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(out_p))

    # converter: exports the reference key and round-trips exactly
    sd = export_torch_state_dict(variables, cfg_v)
    assert "separator.pos_emb.pe_v.weight" in sd
    back = convert_torch_state_dict(sd, cfg_v)
    np.testing.assert_array_equal(
        np.asarray(back["params"]["separator"]["pos_emb"]["pe_v"]),
        np.asarray(pe_v),
    )
