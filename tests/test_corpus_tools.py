"""scp generation + mixture creation tool tests."""

import os

import numpy as np

from sepreformer_tpu.data.audio import read_wav, write_wav
from sepreformer_tpu.data.create_mixtures import (
    active_level_rms,
    create_mixtures,
    mix_pair,
)
from sepreformer_tpu.data.create_scp import generate
from sepreformer_tpu.data.scp import parse_scps


def test_create_scp_wsj_layout(tmp_path, rng):
    root = tmp_path / "corpus"
    for part in ("tr", "cv", "tt"):
        for sub in ("mix", "s1", "s2"):
            d = root / "wav8k" / "min" / part / sub
            d.mkdir(parents=True)
            for i in range(2):
                write_wav(str(d / f"utt{i}.wav"),
                          rng.normal(scale=0.1, size=1000).astype(np.float32),
                          8000)
    out = tmp_path / "scps"
    counts = generate("wsj0-2mix", str(root), str(out))
    assert counts["tr_mix"] == 2 and counts["tt_s2"] == 2
    table = parse_scps(str(out / "tr_mix.scp"))
    assert len(table) == 2
    assert all(os.path.exists(v) for v in table.values())


def test_active_level_ignores_silence(rng):
    sr = 8000
    speech = rng.normal(scale=0.3, size=sr).astype(np.float32)
    padded = np.concatenate([np.zeros(sr * 4, np.float32), speech])
    lev_speech = active_level_rms(speech, sr)
    lev_padded = active_level_rms(padded, sr)
    # plain RMS would drop by sqrt(5); active level stays close
    assert abs(lev_padded - lev_speech) / lev_speech < 0.2


def test_mix_pair_snr_and_lengths(rng):
    sr = 8000
    s1 = rng.normal(scale=0.2, size=6000).astype(np.float32)
    s2 = rng.normal(scale=0.05, size=8000).astype(np.float32)
    mix_min, a_min, b_min, mix_max, a_max, b_max = mix_pair(s1, s2, 2.5, -2.5, sr)
    assert len(mix_min) == 6000 and len(mix_max) == 8000
    np.testing.assert_allclose(mix_min, a_min + b_min, atol=1e-6)
    # requested 5 dB active-level ratio between sources
    ratio_db = 20 * np.log10(
        active_level_rms(a_min, sr) / active_level_rms(b_min, sr)
    )
    assert 3.0 < ratio_db < 7.0


def test_create_mixtures_end_to_end(tmp_path, rng):
    wsj = tmp_path / "wsj"
    (wsj / "si_tr_s").mkdir(parents=True)
    for name in ("a.wav", "b.wav"):
        write_wav(str(wsj / "si_tr_s" / name),
                  rng.normal(scale=0.2, size=4000).astype(np.float32), 8000)
    lst = tmp_path / "mix_2_spk_tr.txt"
    lst.write_text("si_tr_s/a.wav 1.0 si_tr_s/b.wav -1.0\n")
    n = create_mixtures(str(lst), str(wsj), str(tmp_path / "out"),
                        partition="tr")
    assert n == 1
    mix_path = tmp_path / "out" / "wav8k" / "min" / "tr" / "mix" / "a_1_b_-1.wav"
    assert mix_path.exists()
    mix, _ = read_wav(str(mix_path))
    assert np.abs(mix).max() <= 0.95
