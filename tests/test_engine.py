"""Engine integration tests on a tiny variant + synthetic corpus."""

import dataclasses
import os

import numpy as np
import pytest

import jax

from sepreformer_tpu.config import (
    DatasetConfig,
    EngineConfig,
    ModelConfig,
    OptimConfig,
    VariantConfig,
)
from sepreformer_tpu.data.dataset import build_dataloaders
from sepreformer_tpu.engine.engine import Engine
from sepreformer_tpu.engine.lr_control import LRController

from test_data import _make_corpus


def tiny_variant(scp_root, max_len=4000, **engine_kw):
    return VariantConfig(
        name="tiny",
        model=ModelConfig(
            num_stages=2, num_spks=2, enc_dim=16, enc_kernel=16, enc_stride=4,
            feat_dim=16, num_heads=2, pos_maxlen=64, local_kernel=9,
            down_kernel=5, dropout=0.0,
        ),
        optim=OptimConfig(lr=1e-3, warmup_steps=4),
        dataset=DatasetConfig(scp_dir="scp", max_len=max_len, batch_size=2),
        engine=EngineConfig(max_epoch=3, start_scheduling=0, test_epochs=(),
                            **engine_kw),
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return _make_corpus(tmp_path_factory.mktemp("corpus"),
                        n=4, length_range=(6000, 9000))


def test_train_two_epochs_and_resume(corpus, tmp_path):
    cfg = tiny_variant(corpus)
    loaders = build_dataloaders(cfg.dataset, "train", scp_root=corpus)
    workdir = str(tmp_path / "work")
    engine = Engine(cfg, workdir, loaders)
    result = engine.run("train")
    hist = result["history"]
    assert len(hist) == 2  # epochs 1..max_epoch-1 (engine.py:193 semantics)
    assert all(np.isfinite(h["time_loss"]) for h in hist)
    # a checkpoint was saved and a new engine resumes past it
    engine2 = Engine(cfg, workdir, loaders)
    assert engine2.start_epoch > 1


def test_test_mode_writes_csv(corpus, tmp_path):
    cfg = tiny_variant(corpus)
    loaders = build_dataloaders(cfg.dataset, "test", scp_root=corpus)
    workdir = str(tmp_path / "work")
    engine = Engine(cfg, workdir, loaders)
    out = engine._test(compute_sdr=False)
    assert np.isfinite(out["sisnri"])
    assert os.path.exists(os.path.join(workdir, "test_SISNRi_value.csv"))


def test_test_mode_async_sdr(corpus, tmp_path):
    cfg = tiny_variant(corpus)
    loaders = build_dataloaders(cfg.dataset, "test", scp_root=corpus)
    workdir = str(tmp_path / "work")
    engine = Engine(cfg, workdir, loaders)
    out = engine._test(compute_sdr=True)
    assert np.isfinite(out["sisnri"]) and np.isfinite(out["sdri"])
    sdr_csv = os.path.join(workdir, "test_SDRi_value.csv")
    assert os.path.exists(sdr_csv)
    with open(sdr_csv) as f:
        assert len(f.readlines()) == 4  # one row per utterance


def test_infer_sample_writes_wavs(corpus, tmp_path):
    from sepreformer_tpu.data.audio import write_wav

    cfg = tiny_variant(corpus)
    engine = Engine(cfg, str(tmp_path / "work"), {})
    wav = np.random.default_rng(0).normal(scale=0.1, size=7001).astype(np.float32)
    sample = str(tmp_path / "sample.wav")
    write_wav(sample, wav, 8000)
    outs = engine.infer_sample(sample, str(tmp_path / "out"))
    assert len(outs) == 2
    assert all(os.path.exists(p) for p in outs)


def test_infer_sample_chunked(corpus, tmp_path):
    from sepreformer_tpu.data.audio import read_wav, write_wav

    cfg = tiny_variant(corpus)
    engine = Engine(cfg, str(tmp_path / "work"), {})
    wav = np.random.default_rng(1).normal(scale=0.1, size=9000).astype(np.float32)
    sample = str(tmp_path / "sample_long.wav")
    write_wav(sample, wav, 8000)
    outs = engine.infer_sample(sample, str(tmp_path / "out"),
                               chunk_seconds=0.5)  # 4000-sample chunks
    assert len(outs) == 2
    for p in outs:
        audio, _ = read_wav(p, sr=8000)
        assert audio.shape == (9000,)
        assert np.isfinite(audio).all()


def test_strict_reference_best_mode(corpus, tmp_path):
    """engine.strict_reference_best re-seeds the best tracker from the
    session-initial validation loss each epoch (reference engine.py:194
    quirk) — training must run and checkpoint under it."""
    cfg = tiny_variant(corpus, strict_reference_best=True)
    loaders = build_dataloaders(cfg.dataset, "train", scp_root=corpus)
    workdir = str(tmp_path / "work")
    engine = Engine(cfg, workdir, loaders)
    result = engine.run("train")
    assert len(result["history"]) == 2
    assert Engine(cfg, workdir, loaders).start_epoch > 1  # checkpoint saved


def test_test_mode_batched_eval(corpus, tmp_path):
    """eval_batch_size > 1: same utterance set, per-utterance metrics at
    true length, CSV row count unchanged."""
    cfg = tiny_variant(corpus)
    cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, eval_batch_size=3)
    )
    loaders = build_dataloaders(cfg.dataset, "test", scp_root=corpus)
    assert loaders["test"].batch_size == 3
    workdir = str(tmp_path / "work")
    engine = Engine(cfg, workdir, loaders)
    out = engine._test(compute_sdr=False)
    assert np.isfinite(out["sisnri"])
    with open(os.path.join(workdir, "test_SISNRi_value.csv")) as f:
        rows = f.readlines()
    assert len(rows) == 4  # one per utterance despite batching


def test_lr_controller_semantics():
    ctl = LRController(base_lr=1.0, warmup_steps=10, plateau_factor=0.5,
                       plateau_patience=1, min_lr=1e-10)
    assert ctl.lr == 0.0  # before any warmup step
    for _ in range(5):
        ctl.warmup_step()
    assert abs(ctl.lr - 0.5) < 1e-9
    for _ in range(10):
        ctl.warmup_step()
    assert ctl.lr == 1.0
    # plateau: first value sets best; repeats past patience decay
    ctl.plateau_step(1.0)
    assert ctl.plateau_scale == 1.0
    ctl.plateau_step(1.0)   # bad 1 (<= patience)
    assert ctl.plateau_scale == 1.0
    ctl.plateau_step(1.0)   # bad 2 -> decay
    assert ctl.plateau_scale == 0.5
    # roundtrip
    d = ctl.state_dict()
    ctl2 = LRController(1.0, 10, 0.5, 1, 1e-10)
    ctl2.load_state_dict(d)
    assert ctl2.lr == ctl.lr


def test_gradient_accumulation_matches_big_batch():
    """accum_steps=2 on a duplicated batch equals the accum_steps=1 step
    exactly: with both halves identical, per-micro BN statistics equal the
    full-batch statistics, so the mean gradient (and the AdamW update on
    it) must match to float tolerance."""
    from dataclasses import replace

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sepreformer_tpu.config import (
        ModelConfig,
        OptimConfig,
        VariantConfig,
    )
    from sepreformer_tpu.engine.train import create_train_state, make_train_step

    model = ModelConfig(
        num_stages=1, num_spks=2, enc_dim=16, enc_kernel=16, enc_stride=4,
        feat_dim=16, num_heads=2, pos_maxlen=64, local_kernel=9,
        down_kernel=5, dropout=0.0,
    )
    base = VariantConfig(name="accum-test", model=model,
                         optim=OptimConfig(lr=1e-3))
    accum = replace(base, optim=replace(base.optim, accum_steps=2))

    t = 2000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=0.1, size=(2, t)), jnp.float32)
    s = jnp.asarray(rng.normal(scale=0.05, size=(2, 2, t)), jnp.float32)
    # duplicated halves -> micro-batch BN stats == full-batch BN stats
    x2 = jnp.concatenate([x, x], axis=0)
    s2 = jnp.concatenate([s, s], axis=1)

    state = create_train_state(base, jax.random.key(0), sample_len=t)
    key = jax.random.key(1)
    lr, alpha = jnp.float32(1e-3), jnp.float32(0.4)

    s_a, m_a = make_train_step(base, donate=False, debug_grads=True)(
        state, x2, s2, lr, alpha, key)
    s_b, m_b = make_train_step(accum, donate=False, debug_grads=True)(
        state, x2, s2, lr, alpha, key)

    np.testing.assert_allclose(float(m_a["total_loss"]),
                               float(m_b["total_loss"]), rtol=1e-5)
    # compare the mean gradients, not post-Adam params: Adam's first step is
    # lr*sign(g), which flips on fp-noise-level gradient differences
    norm = float(m_a["grad_norm"])
    for a, b in zip(jax.tree.leaves(m_a["grads"]),
                    jax.tree.leaves(m_b["grads"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5 * norm)

    # non-divisible batch is an error
    import pytest

    bad = replace(base, optim=replace(base.optim, accum_steps=3))
    with pytest.raises(ValueError):
        make_train_step(bad, donate=False)(state, x2, s2, lr, alpha, key)


def test_periodic_checkpoint_and_step_logging(corpus, tmp_path, caplog):
    """save_every_n_epochs checkpoints even when valid loss regresses;
    log_every_steps emits running-mean lines."""
    import logging as _logging

    from sepreformer_tpu.engine.checkpoint import latest_epoch

    cfg = tiny_variant(corpus, save_every_n_epochs=1, log_every_steps=1)
    loaders = build_dataloaders(cfg.dataset, "train", scp_root=corpus)
    workdir = str(tmp_path / "work")
    engine = Engine(cfg, workdir, loaders)
    with caplog.at_level(_logging.INFO, logger="sepreformer_tpu"):
        engine.run("train")
    # every epoch checkpointed regardless of best tracking
    assert latest_epoch(engine.ckpt_dir) == cfg.engine.max_epoch - 1
    assert any("step 1/" in r.message for r in caplog.records)


def test_steps_per_dispatch_matches_single_dispatch(corpus, tmp_path):
    """engine.steps_per_dispatch=2 (grouped lax.scan dispatch) must
    reproduce the per-step dispatch training INCLUDING dropout: the
    grouped scan consumes the same per-step rng keys the single-step
    path draws, so each step's MATH is identical.  Bitwise equality
    holds per step but not end-to-end: the scan body compiles with
    different fusions than the lone step, and the resulting fp
    reassociation drift compounds through the trained params — hence
    exact (1e-6) train-loss equality per epoch and rtol 1e-4 on the
    valid loss computed from the drifted weights."""
    from dataclasses import replace

    def run(k, sub):
        cfg = tiny_variant(corpus, steps_per_dispatch=k)
        cfg = replace(cfg, model=replace(cfg.model, dropout=0.2))
        loaders = build_dataloaders(cfg.dataset, "train", scp_root=corpus)
        engine = Engine(cfg, str(tmp_path / sub), loaders, seed=5)
        return engine.run("train")["history"]

    h1 = run(1, "w1")
    h2 = run(2, "w2")
    assert len(h1) == len(h2)
    for a, b in zip(h1, h2):
        np.testing.assert_allclose(a["time_loss"], b["time_loss"],
                                   rtol=1e-6, atol=1e-7)
        # the scan body compiles with different fusions than the lone
        # step -> fp reassociation drift in the trained params
        np.testing.assert_allclose(a["valid"], b["valid"], rtol=1e-4)


def test_flat_opt_state_matches_per_leaf(corpus):
    """optim.flat_opt_state computes the IDENTICAL update on one raveled
    vector (clip/adam/decay are elementwise or globally-reduced) — two
    steps must track the per-leaf path to fp noise."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from sepreformer_tpu.engine.train import create_train_state, make_train_step

    cfg = tiny_variant(corpus)
    cfg_flat = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, flat_opt_state=True))
    t = 4000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=0.05, size=(2, t)), jnp.float32)
    src = jnp.stack([x * 0.6, x * 0.4])
    lr, alpha = jnp.float32(1e-3), jnp.float32(0.3)

    states = {}
    for name, c in (("leaf", cfg), ("flat", cfg_flat)):
        state = create_train_state(c, jax.random.key(3), sample_len=t)
        step = make_train_step(c, donate=False)
        state, m = step(state, x, src, lr, alpha, jax.random.key(9))
        states[name] = (state, m)
    pa = jax.tree.leaves(states["leaf"][0].params)
    pb = jax.tree.leaves(states["flat"][0].params)
    # one step: the two paths are elementwise-identical math; only
    # XLA fusion/reduction-order ulps differ.  (A second step would feed
    # those ulps through the whole network's gradient and amplify them
    # chaotically — not a correctness signal.)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        float(states["leaf"][1]["grad_norm"]),
        float(states["flat"][1]["grad_norm"]), rtol=1e-5)
