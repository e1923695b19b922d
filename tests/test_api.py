"""One-call library API (sepreformer_tpu.api)."""

import numpy as np
import pytest

from sepreformer_tpu.config import (
    DatasetConfig,
    EngineConfig,
    ModelConfig,
    OptimConfig,
    VariantConfig,
)


def _tiny_cfg():
    return VariantConfig(
        name="api-tiny",
        model=ModelConfig(num_stages=1, num_spks=2, enc_dim=16,
                          enc_kernel=16, enc_stride=4, feat_dim=16,
                          num_heads=2, pos_maxlen=64, local_kernel=9,
                          down_kernel=5, dropout=0.0),
        optim=OptimConfig(lr=1e-3, warmup_steps=2),
        dataset=DatasetConfig(max_len=4000, batch_size=2),
        engine=EngineConfig(max_epoch=2, start_scheduling=0, test_epochs=()),
    )


def test_separator_on_array_and_path(tmp_path):
    from sepreformer_tpu import load_separator
    from sepreformer_tpu.data.audio import write_wav

    sep = load_separator(_tiny_cfg())
    t = 6001  # odd length exercises bucket+stride padding and truncation
    wav = np.random.default_rng(0).normal(scale=0.1, size=t).astype(np.float32)
    outs = sep(wav)
    assert len(outs) == 2 and all(o.shape == (t,) for o in outs)
    assert all(np.isfinite(o).all() for o in outs)

    p = tmp_path / "mix.wav"
    write_wav(str(p), wav, sep.sampling_rate)
    outs2 = sep(str(p))
    # wav round-trips through int16, so compare loosely to the array path
    assert len(outs2) == 2 and outs2[0].shape == (t,)

    with pytest.raises(ValueError):
        sep(np.zeros((2, 100), np.float32))


def test_load_separator_from_orbax_workdir(tmp_path):
    import jax

    from sepreformer_tpu.api import load_separator
    from sepreformer_tpu.engine.checkpoint import save_checkpoint
    from sepreformer_tpu.engine.train import create_train_state

    cfg = _tiny_cfg()
    state = create_train_state(cfg, jax.random.key(7))
    ckpt_dir = str(tmp_path / "scratch_weights")
    save_checkpoint(ckpt_dir, 3, state)

    sep = load_separator(cfg, checkpoint=ckpt_dir)
    leaf = jax.tree.leaves(sep.params)[0]
    ref = jax.tree.leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(ref))

    with pytest.raises(FileNotFoundError):
        load_separator(cfg, checkpoint=str(tmp_path / "nope"))


def test_separator_padding_invisible():
    """Bucket padding must not change the separated samples: the API now
    threads true lengths into the masked exact-eval path, so the output
    at an odd length equals a direct unpadded forward (the reference's
    batch-1 true-length processing)."""
    import jax.numpy as jnp

    from sepreformer_tpu import load_separator
    from sepreformer_tpu.engine.train import make_forward_fn

    sep = load_separator(_tiny_cfg())
    t = 6000  # multiple of enc_stride -> an exact unpadded forward exists
    wav = np.random.default_rng(1).normal(scale=0.1, size=t).astype(np.float32)
    outs = sep(wav)  # pads to the 8000-sample bucket internally

    fwd = make_forward_fn(sep.variant)
    direct = np.asarray(
        fwd(sep.params, sep.batch_stats, jnp.asarray(wav[None]))
    )[:, 0, :]
    got = np.stack(outs)
    # PIT: match each direct source to the closer API output
    err = min(
        np.abs(got - direct).max(),
        np.abs(got[::-1] - direct).max(),
    )
    assert err <= 1e-4, f"bucket padding visible: max abs diff {err}"
