"""Synthetic corpus generator: layout, loadability, and separability.

The corpus must flow through the exact production data path (scp parse ->
SeparationDataset -> DataLoader) including dynamic mixing's WSJ-style
speaker-id key parsing, and its mixtures must actually be separable by an
ideal separator (sources not degenerate / correlated).
"""

import os

import numpy as np

from sepreformer_tpu.config import DatasetConfig
from sepreformer_tpu.data.dataset import build_dataloaders, _wsj_speakers
from sepreformer_tpu.data.synth import generate_corpus, random_speaker, synth_utterance


def test_generate_corpus_layout_and_loading(tmp_path):
    out = str(tmp_path / "corpus")
    scp_dir = generate_corpus(
        out, n_train=6, n_valid=2, n_test=2, sr=8000,
        utt_seconds=(1.0, 1.5), n_train_speakers=4, n_test_speakers=3,
        seed=0,
    )
    for part in ("tr", "cv", "tt"):
        for sub in ("mix", "s1", "s2"):
            p = os.path.join(scp_dir, f"{part}_{sub}.scp")
            assert os.path.exists(p), p

    cfg = DatasetConfig(scp_dir="scp", max_len=8000, batch_size=2,
                        num_workers=0)
    loaders = build_dataloaders(cfg, "train", scp_root=out)
    batch = next(iter(loaders["train"]))
    assert batch.mixture.shape == (2, 8000)
    assert batch.sources.shape == (2, 2, 8000)
    # mixture == sum of sources on the non-padded region
    n = int(batch.input_sizes[0])
    np.testing.assert_allclose(
        batch.mixture[0, :n], batch.sources[:, 0, :n].sum(0),
        rtol=0, atol=1e-4,
    )

    # keys parse as WSJ speaker ids (needed by dynamic mixing)
    ds = loaders["train"].dataset
    spk1, spk2 = _wsj_speakers(ds.keys[0])
    assert spk1.startswith("s") and spk2.startswith("s") and spk1 != spk2

    # dynamic mixing runs on this corpus
    dm_cfg = DatasetConfig(scp_dir="scp", max_len=8000, batch_size=2,
                           num_workers=0, dynamic_mixing=True,
                           dm_flavor="wsj0")
    dm_loaders = build_dataloaders(dm_cfg, "train", scp_root=out)
    dm_batch = next(iter(dm_loaders["train"]))
    assert dm_batch.mixture.shape == (2, 8000)


def test_synth_utterances_are_separable():
    """Two different voices must be spectrally distinct: the SI-SNR of the
    mixture against each source is well below the 0 dB an ideal separator
    clears, and the sources are nearly uncorrelated."""
    rng = np.random.default_rng(1)
    a, b = random_speaker(rng), random_speaker(rng)
    n = 16000
    s1 = synth_utterance(rng, a, n, 8000)
    s2 = synth_utterance(rng, b, n, 8000)
    corr = np.dot(s1, s2) / (np.linalg.norm(s1) * np.linalg.norm(s2) + 1e-9)
    assert abs(corr) < 0.1, f"sources too correlated: {corr}"
    assert np.abs(s1).max() > 0.1 and np.abs(s2).max() > 0.1
    # voiced structure: energy is concentrated (pauses exist)
    frames = s1[: n // 400 * 400].reshape(-1, 400)
    energy = (frames ** 2).mean(1)
    assert energy.min() < 0.01 * energy.max()


def test_generate_corpus_wham_whamr_flavors(tmp_path):
    """The noisy/reverberant synthetic corpora feed the matching presets'
    datasets end-to-end: scp layout, DM flavors, finite audio, and (WHAMR)
    reverberant-mixture/anechoic-target semantics."""
    import numpy as np

    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.data.dataset import SeparationDataset
    from sepreformer_tpu.data.synth import generate_corpus

    for flavor, preset in [("wham", "SepReformer_Large_DM_WHAM"),
                           ("whamr", "SepReformer_Large_DM_WHAMR")]:
        out = tmp_path / flavor
        generate_corpus(str(out), n_train=6, n_valid=2, n_test=2,
                        utt_seconds=(1.0, 1.5), flavor=flavor, seed=3)
        cfg = get_variant(preset).dataset
        from dataclasses import replace
        cfg = replace(cfg, scp_dir="scp", max_len=8000)
        rng = np.random.default_rng(0)
        for part in ("train", "test"):
            ds = SeparationDataset(cfg, part, scp_root=str(out))
            mix, srcs = ds.load(ds.keys[0], rng)
            assert np.isfinite(mix).all() and len(srcs) == 2
            assert all(len(s) == len(mix) for s in srcs)
        # mixture contains noise: it differs from the sum of the targets
        ds = SeparationDataset(cfg, "test", scp_root=str(out))
        mix, srcs = ds.load(ds.keys[0], rng)
        resid = mix - sum(srcs)
        assert float(np.abs(resid).max()) > 1e-4
