"""Numeric tests of core signal ops against torch ground truth.

torch (CPU) is used purely as an oracle for the op semantics the reference
relies on (Conv1d / ConvTranspose1d / adaptive_avg_pool1d / nearest
interpolate); nothing is copied from the reference repo.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sepreformer_tpu.ops.framing import (
    decoder_overlap_add,
    encoder_conv,
    frame_signal,
)
from sepreformer_tpu.ops.resample import (
    adaptive_avg_pool_time,
    nearest_upsample_time,
)
from sepreformer_tpu.ops.stft import make_stft_kernel, stft_magnitude


def test_frame_signal_matches_unfold(rng):
    x = rng.normal(size=(2, 64)).astype(np.float32)
    frames = np.asarray(frame_signal(jnp.asarray(x), kernel=16, stride=4))
    ref = torch.from_numpy(x).unfold(1, 16, 4).numpy()
    np.testing.assert_allclose(frames, ref, rtol=0, atol=0)


def test_encoder_conv_matches_torch_conv1d(rng):
    x = rng.normal(size=(3, 160)).astype(np.float32)
    w = rng.normal(size=(16, 32)).astype(np.float32)  # [k, n]
    out = np.asarray(encoder_conv(jnp.asarray(x), jnp.asarray(w), stride=4))
    # torch conv weight layout: [out_ch, in_ch, k]
    ref = F.conv1d(
        torch.from_numpy(x)[:, None], torch.from_numpy(w.T[:, None]), stride=4
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_decoder_ola_matches_torch_conv_transpose1d(rng):
    h = rng.normal(size=(2, 37, 32)).astype(np.float32)
    w = rng.normal(size=(32, 16)).astype(np.float32)  # [n, k]
    out = np.asarray(decoder_overlap_add(jnp.asarray(h), jnp.asarray(w), stride=4))
    ref = F.conv_transpose1d(
        torch.from_numpy(h.transpose(0, 2, 1)),
        torch.from_numpy(w[:, None]),
        stride=4,
    ).numpy()[:, 0]
    assert out.shape == ref.shape == (2, 36 * 4 + 16)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("t,o", [(64, 16), (64, 64), (100, 16), (37, 12)])
def test_adaptive_avg_pool_matches_torch(rng, t, o):
    x = rng.normal(size=(2, t, 8)).astype(np.float32)
    out = np.asarray(adaptive_avg_pool_time(jnp.asarray(x), o))
    ref = F.adaptive_avg_pool1d(
        torch.from_numpy(x.transpose(0, 2, 1)), o
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("t,o", [(16, 64), (16, 16), (12, 37), (500, 7997)])
def test_nearest_upsample_matches_torch(rng, t, o):
    x = rng.normal(size=(2, t, 4)).astype(np.float32)
    out = np.asarray(nearest_upsample_time(jnp.asarray(x), o))
    ref = F.interpolate(
        torch.from_numpy(x.transpose(0, 2, 1)), size=o, mode="nearest"
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)


def test_stft_magnitude_matches_reference_formulation(rng):
    """Validate against the reference STFT built with torch fft + conv1d
    (the construction described at criterions.py:43-61), re-derived here."""
    frame_len, frame_shift = 64, 16
    x = rng.normal(size=(2, 200)).astype(np.float32)

    # oracle: torch conv1d with window-scaled rfft(eye) kernel
    n = frame_len
    w = torch.hann_window(n, periodic=True)
    w = ((2.0 / 3.0) ** 0.5) * w  # shift == n//4
    s = 0.5 * (n * n / frame_shift) ** 0.5
    k = torch.fft.rfft(torch.eye(n) / s, dim=1)
    k = torch.stack((k.real, k.imag), dim=2)
    k = torch.transpose(k, 0, 2) * w
    k = torch.reshape(k, (n + 2, 1, n)).float()
    n_frames = int(np.ceil(x.shape[-1] / frame_shift))
    xp = np.pad(x, ((0, 0), (0, n_frames * frame_shift - x.shape[-1])))
    c = F.conv1d(torch.from_numpy(xp)[:, None], k, stride=frame_shift)
    r, i = torch.chunk(c, 2, dim=1)
    ref_mag = torch.sqrt(r * r + i * i + 1e-10).numpy()  # [B, bins, T]

    kernel = make_stft_kernel(frame_len, frame_shift)
    out = np.asarray(
        stft_magnitude(jnp.asarray(x), jnp.asarray(kernel), frame_shift)
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(out, ref_mag, rtol=1e-4, atol=1e-5)
