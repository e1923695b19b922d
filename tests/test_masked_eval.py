"""Masked exact-eval: bucket/batch padding must be invisible.

The reference evaluates at batch 1 on the TRUE utterance length
(dataset.py:30), padding internally to a 2^R frame multiple
(pad_signal, module.py:220-234).  Our loader bucket-pads for static XLA
shapes; with ``lengths`` threaded through the model
(``SepReformer.__call__(..., lengths=...)``) every length-sensitive op
(encoder-tail frames, GroupNorm statistics, attention spans at the EGA
bottleneck, depthwise/downsample conv boundaries, the final overlap-add)
ignores the padding, so the padded/batched forward reproduces the
true-length batch-1 output exactly.

These tests pin that contract:
- padded + masked  == true-length unmasked (the reference semantics);
- batched + masked == each utterance alone (batch invariance);
- LocalBlock/GroupNorm internals agree with hand-computed masked stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sepreformer_tpu.config import ModelConfig
from sepreformer_tpu.models import SepReformer


def tiny_cfg(**kw):
    base = dict(
        num_stages=2, num_spks=2, enc_dim=16, enc_kernel=16, enc_stride=4,
        feat_dim=16, num_heads=2, pos_maxlen=512, local_kernel=9,
        down_kernel=5, dropout=0.0,
    )
    base.update(kw)
    return ModelConfig(**base)


def _init(cfg, t, seed=0):
    model = SepReformer(cfg)
    x = jnp.zeros((1, t), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(seed), x)
    return model, variables


@pytest.mark.parametrize("t_true", [788, 800, 1000])
def test_masked_padded_equals_true_length(t_true):
    """model(pad(x), lengths=[t])[:, :, :t] == model(x[:t]) exactly
    (true-length run = the reference's batch-1 semantics)."""
    cfg = tiny_cfg()
    t_pad = 1600  # a bucket length well past every t_true
    model, variables = _init(cfg, t_pad)
    rng = np.random.default_rng(t_true)
    wav = rng.normal(size=(1, t_true)).astype(np.float32)

    ref, _ = model.apply(variables, jnp.asarray(wav))
    padded = np.zeros((1, t_pad), np.float32)
    padded[:, :t_true] = wav
    got, _ = model.apply(
        variables, jnp.asarray(padded),
        lengths=jnp.asarray([t_true], jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(got)[:, :, :t_true], np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_masked_batch_equals_each_alone():
    """A mixed-length masked batch gives every utterance the same output
    as running it alone (masked, any padding)."""
    cfg = tiny_cfg()
    lens = [788, 1000, 1432]
    t_pad = 1600
    model, variables = _init(cfg, t_pad)
    rng = np.random.default_rng(7)
    wavs = [rng.normal(size=(t,)).astype(np.float32) for t in lens]

    batch = np.zeros((len(lens), t_pad), np.float32)
    for i, w in enumerate(wavs):
        batch[i, : len(w)] = w
    got, _ = model.apply(
        variables, jnp.asarray(batch), lengths=jnp.asarray(lens, jnp.int32)
    )
    got = np.asarray(got)

    for i, (t, w) in enumerate(zip(lens, wavs)):
        solo_pad = np.zeros((1, 1200 if t <= 1200 else t_pad), np.float32)
        solo_pad[0, :t] = w
        solo, _ = model.apply(
            variables, jnp.asarray(solo_pad),
            lengths=jnp.asarray([t], jnp.int32),
        )
        np.testing.assert_allclose(
            got[:, i, :t], np.asarray(solo)[:, 0, :t], atol=2e-5, rtol=1e-5,
        )


def test_unmasked_path_unchanged():
    """lengths=None is byte-identical to the pre-masking forward (the
    masking code must add zero ops when disabled)."""
    cfg = tiny_cfg()
    model, variables = _init(cfg, 800)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 800)), jnp.float32
    )
    a1, _ = model.apply(variables, x)
    a2, _ = model.apply(variables, x, lengths=None)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_masked_groupnorm_statistics():
    """SpkSplitStage's masked GroupNorm matches hand-computed masked
    mean/var over (valid T, F)."""
    from sepreformer_tpu.models.blocks import SpkSplitStage

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 12, 8)).astype(np.float32)
    lens = np.asarray([8, 12], np.int32)
    block = SpkSplitStage(dim=8, num_spks=2)
    variables = block.init(jax.random.key(0), jnp.asarray(x))

    got = np.asarray(
        block.apply(variables, jnp.asarray(x), jnp.asarray(lens))
    )

    # reproduce: full forward through the projections, then a manual
    # masked GroupNorm over (T_valid, F)
    import flax.linen as fnn

    from sepreformer_tpu.models.blocks import TorchLinear, glu_last

    class Stem(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            y = TorchLinear(4 * 8 * 2, name="proj_in")(x)
            y = glu_last(y)
            y = TorchLinear(8 * 2, name="proj_out")(y)
            y = y.reshape(2, 12, 2, 8)
            return y.transpose(0, 2, 1, 3).reshape(4, 12, 8)

    stem_vars = {"params": {
        "proj_in": variables["params"]["proj_in"],
        "proj_out": variables["params"]["proj_out"],
    }}
    y = np.asarray(Stem().apply(stem_vars, jnp.asarray(x)))
    gamma = np.asarray(variables["params"]["norm"]["scale"])
    beta = np.asarray(variables["params"]["norm"]["bias"])
    lens_rep = np.repeat(lens, 2)
    for row in range(4):
        v = int(lens_rep[row])
        valid = y[row, :v]                      # [v, F]
        mu, var = valid.mean(), valid.var()
        want = (y[row] - mu) / np.sqrt(var + 1e-8) * gamma + beta
        np.testing.assert_allclose(got[row, :v], want[:v],
                                   atol=2e-5, rtol=1e-4)


def test_engine_batched_eval_matches_batch1(tmp_path):
    """Engine._test per-utterance SI-SNRi identical (<= 1e-4 dB) between
    eval_batch_size 1 and 3 on a mixed-length corpus."""
    import csv
    from dataclasses import replace

    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.data.audio import write_wav
    from sepreformer_tpu.data.dataset import build_dataloaders
    from sepreformer_tpu.engine.engine import Engine

    # tiny mixed-length corpus
    scp_dir = tmp_path / "scp"
    wav_dir = tmp_path / "wav"
    scp_dir.mkdir()
    wav_dir.mkdir()
    rng = np.random.default_rng(11)
    lines = {"mix": [], "s1": [], "s2": []}
    for i, t in enumerate([780, 1000, 1500, 2100, 3000]):
        s1 = rng.normal(size=t).astype(np.float32) * 0.1
        s2 = rng.normal(size=t).astype(np.float32) * 0.1
        for name, sig in [("mix", s1 + s2), ("s1", s1), ("s2", s2)]:
            p = wav_dir / f"u{i}_{name}.wav"
            write_wav(str(p), sig, 8000)
            lines[name].append(f"u{i} {p}")
    for name, fname in [("mix", "tt_mix.scp"), ("s1", "tt_s1.scp"),
                        ("s2", "tt_s2.scp")]:
        (scp_dir / fname).write_text("\n".join(lines[name]) + "\n")

    cfg = get_variant("SepReformer_T")
    cfg = replace(
        cfg,
        model=replace(cfg.model, num_stages=2, feat_dim=16, enc_dim=16,
                      num_heads=2, local_kernel=9, dropout=0.0),
        dataset=replace(cfg.dataset, scp_dir=str(scp_dir)),
    )

    def run(ebs):
        c = replace(cfg, dataset=replace(cfg.dataset, eval_batch_size=ebs))
        loaders = build_dataloaders(c.dataset, "test", scp_root="/")
        workdir = str(tmp_path / f"wd{ebs}")
        eng = Engine(c, workdir, loaders, seed=0)
        eng._test(compute_sdr=False)
        with open(f"{workdir}/test_SISNRi_value.csv") as f:
            return {row[0]: float(row[1]) for row in csv.reader(f)}

    a, b = run(1), run(3)
    assert a.keys() == b.keys() and len(a) == 5
    for k in a:
        assert abs(a[k] - b[k]) <= 1e-4, (k, a[k], b[k])
