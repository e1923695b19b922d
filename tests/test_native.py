"""Native C++ wav loader tests (skipped when no toolchain)."""

import numpy as np
import pytest

from sepreformer_tpu.data.audio import write_wav
from sepreformer_tpu.native import (
    native_available,
    read_wav_batch_native,
    read_wav_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_native_read_matches_scipy(tmp_path, rng):
    from scipy.io import wavfile

    x = (rng.normal(scale=0.2, size=8000)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 8000)
    native = read_wav_native(p)
    assert native is not None
    arr, rate = native
    assert rate == 8000
    ref_rate, ref = wavfile.read(p)
    np.testing.assert_allclose(arr, ref.astype(np.float32) / 32768.0, atol=1e-7)


def test_native_batch_crop_and_pad(tmp_path, rng):
    paths = []
    for i, n in enumerate([5000, 9000, 2000]):
        x = rng.normal(scale=0.2, size=n).astype(np.float32)
        p = str(tmp_path / f"w{i}.wav")
        write_wav(p, x, 8000)
        paths.append(p)
    out = read_wav_batch_native(paths, crop_len=4000, offsets=[0, 1000, 0])
    assert out is not None
    batch, lengths, rates = out
    assert batch.shape == (3, 4000)
    assert lengths.tolist() == [5000, 9000, 2000]
    assert (rates == 8000).all()
    # third file shorter than crop -> zero-padded tail
    assert np.all(batch[2, 2000:] == 0)
    # second file offset: compare against single read
    full, _ = read_wav_native(paths[1])
    np.testing.assert_allclose(batch[1], full[1000:5000], atol=1e-7)


def test_native_missing_file_returns_none():
    assert read_wav_native("/nonexistent/file.wav") is None
