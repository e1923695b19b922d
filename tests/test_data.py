"""Data pipeline tests over synthetic wav fixtures."""

import os

import numpy as np
import pytest

from sepreformer_tpu.config import DatasetConfig
from sepreformer_tpu.data.audio import peak_normalize, read_wav, write_wav
from sepreformer_tpu.data.dataset import (
    DataLoader,
    SeparationDataset,
    collate,
)
from sepreformer_tpu.data.scp import parse_scps


def _make_corpus(tmp_path, n=6, sr=8000, spks=2, noise=False, reverb=False,
                 length_range=(20000, 48000), wsj_keys=True):
    """Write a fake scp corpus; keys follow the WSJ mixture naming so the
    dynamic-mixing speaker check can parse them."""
    rng = np.random.default_rng(0)
    scp_dir = tmp_path / "scp"
    wav_dir = tmp_path / "wav"
    scp_dir.mkdir(exist_ok=True)
    wav_dir.mkdir(exist_ok=True)
    rows = {f"s{i+1}": [] for i in range(spks)}
    rows["mix"] = []
    if noise:
        rows["n"] = []
    if reverb:
        rows["s1r"], rows["s2r"] = [], []
    for i in range(n):
        t = int(rng.integers(*length_range))
        key = (
            f"{i:03d}a010{i}_0.91_{i+100:03d}o0a0{i}_-0.91"
            if wsj_keys else f"utt{i}"
        )
        srcs = [rng.normal(scale=0.1, size=t).astype(np.float32) for _ in range(spks)]
        mix = sum(srcs)
        for name, sig in zip([f"s{j+1}" for j in range(spks)] + ["mix"], srcs + [mix]):
            p = wav_dir / f"{key}_{name}.wav"
            write_wav(str(p), sig, sr)
            rows[name].append(f"{key} {p}")
        if noise:
            p = wav_dir / f"{key}_n.wav"
            write_wav(str(p), rng.normal(scale=0.05, size=t).astype(np.float32), sr)
            rows["n"].append(f"{key} {p}")
        if reverb:
            for j in (1, 2):
                p = wav_dir / f"{key}_s{j}r.wav"
                write_wav(str(p), srcs[j - 1] * 0.8, sr)
                rows[f"s{j}r"].append(f"{key} {p}")
    files = {
        "tr_mix.scp": rows["mix"], "tr_s1.scp": rows["s1"], "tr_s2.scp": rows["s2"],
        "cv_mix.scp": rows["mix"], "cv_s1.scp": rows["s1"], "cv_s2.scp": rows["s2"],
        "tt_mix.scp": rows["mix"], "tt_s1.scp": rows["s1"], "tt_s2.scp": rows["s2"],
    }
    if noise:
        files["tr_n.scp"] = rows["n"]
    if reverb:
        files["tr_s1_reverb.scp"] = rows["s1r"]
        files["tr_s2_reverb.scp"] = rows["s2r"]
    for name, lines in files.items():
        (scp_dir / name).write_text("\n".join(lines) + "\n")
    return str(tmp_path)


def test_wav_roundtrip(tmp_path):
    x = np.sin(np.linspace(0, 100, 16000)).astype(np.float32) * 0.5
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 8000)
    y, sr = read_wav(p)
    assert sr == 8000
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_read_wav_resamples(tmp_path):
    x = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
    p = str(tmp_path / "b.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p, sr=8000)
    assert sr == 8000
    assert abs(len(y) - 8000) <= 1


def test_parse_scps_duplicate_error(tmp_path):
    p = tmp_path / "x.scp"
    p.write_text("a /p1\na /p2\n")
    with pytest.raises(ValueError):
        parse_scps(str(p))


def test_direct_load_and_collate(tmp_path):
    root = _make_corpus(tmp_path)
    cfg = DatasetConfig(scp_dir="scp", max_len=32000)
    ds = SeparationDataset(cfg, "train", scp_root=root)
    rng = np.random.default_rng(0)
    mix, srcs = ds.load(ds.keys[0], rng)
    assert len(mix) % 4 == 0
    assert len(mix) <= 32000
    np.testing.assert_allclose(mix, srcs[0] + srcs[1], atol=1e-3)

    batch = collate(
        [(mix, srcs, "k0"), (mix[:20000], [s[:20000] for s in srcs], "k1")],
        pad_to=32000,
    )
    assert batch.mixture.shape == (2, 32000)
    assert batch.sources.shape == (2, 2, 32000)
    assert batch.input_sizes[0] >= batch.input_sizes[1]  # sorted desc


def test_dataloader_static_shapes_and_sharding(tmp_path):
    root = _make_corpus(tmp_path)
    cfg = DatasetConfig(scp_dir="scp", max_len=32000, batch_size=2)
    ds = SeparationDataset(cfg, "train", scp_root=root)
    loader = DataLoader(ds, batch_size=2, shuffle=True, pad_to=32000, drop_last=True)
    batches = list(loader)
    assert all(b.mixture.shape == (2, 32000) for b in batches)
    # host sharding partitions keys disjointly
    l0 = DataLoader(ds, 2, False, 32000, host_id=0, num_hosts=2)
    l1 = DataLoader(ds, 2, False, 32000, host_id=1, num_hosts=2)
    k0 = {k for b in l0 for k in b.keys}
    k1 = {k for b in l1 for k in b.keys}
    assert not (k0 & k1)
    assert k0 | k1 == set(ds.keys)


@pytest.mark.parametrize("flavor,noise,reverb", [
    ("wsj0", False, False), ("wsj0_base", False, False),
    ("wham", True, False), ("whamr", True, True),
])
def test_dynamic_mixing_flavors(tmp_path, flavor, noise, reverb):
    root = _make_corpus(tmp_path, noise=noise, reverb=reverb)
    cfg = DatasetConfig(
        scp_dir="scp", max_len=32000, dynamic_mixing=True, dm_flavor=flavor,
        train_noise="tr_n.scp" if noise else None,
        train_reverb_sources=("tr_s1_reverb.scp", "tr_s2_reverb.scp") if reverb else (),
    )
    ds = SeparationDataset(cfg, "train", scp_root=root)
    rng = np.random.default_rng(0)
    for key in ds.keys[:3]:
        mix, srcs = ds.load(key, rng)
        assert len(mix) % 4 == 0
        assert len(mix) <= 32000
        assert len(srcs) == 2
        assert all(len(s) == len(mix) for s in srcs)
        assert np.isfinite(mix).all()


def test_eval_bucketing(tmp_path):
    root = _make_corpus(tmp_path)
    cfg = DatasetConfig(scp_dir="scp")
    ds = SeparationDataset(cfg, "test", scp_root=root)
    loader = DataLoader(ds, batch_size=1, shuffle=False, pad_to=None,
                        eval_bucket=4000)
    for b in loader:
        assert b.mixture.shape[1] % 4000 == 0
        assert b.mixture.shape[1] >= b.input_sizes[0]


def test_peak_normalize():
    x = np.array([0.1, -0.4, 0.2], np.float32)
    y = peak_normalize(x, 0.9)
    np.testing.assert_allclose(np.abs(y).max(), 0.9, rtol=1e-6)


def test_parallel_loader_matches_batches(tmp_path):
    """num_workers > 1 yields the same set of (key -> data) pairs; crops
    come from per-item spawned rngs so results are deterministic in
    (seed, epoch, index) regardless of thread scheduling."""
    root = _make_corpus(tmp_path, n=6, length_range=(6000, 9000))
    cfg = DatasetConfig(scp_dir="scp", max_len=4000, batch_size=2)
    ds = SeparationDataset(cfg, "train", root)

    def collect(workers):
        dl = DataLoader(ds, batch_size=2, shuffle=True, pad_to=4000,
                        seed=3, num_workers=workers)
        dl.set_epoch(1)
        out = {}
        for batch in dl:
            for j, key in enumerate(batch.keys):
                out[key] = (np.asarray(batch.mixture[j]),
                            np.asarray(batch.sources[:, j]))
        return out

    a = collect(4)
    b = collect(4)
    assert set(a) == set(ds.keys)
    for k in a:  # determinism across runs at same worker count
        np.testing.assert_array_equal(a[k][0], b[k][0])
        np.testing.assert_array_equal(a[k][1], b[k][1])

    # the serial path stays byte-deterministic too and covers the same keys
    s = collect(1)
    assert set(s) == set(a)
