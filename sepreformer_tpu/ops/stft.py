"""STFT magnitude as a single framing + matmul — MXU-native.

The reference implements STFT as a fixed Conv1d whose kernel is a
window-scaled DFT matrix built from ``torch.fft.rfft(torch.eye(N))``
(utils/implements/criterions.py:43-61).  On TPU the same computation is one
[B*T, N] x [N, 2*(N/2+1)] matmul over polyphase frames; we reproduce the
reference's exact scaling so magnitude losses are numerically comparable:

- periodic hann window
- window *= sqrt(2/3) when shift == N/4 (perfect-OLA scaling)
- kernel /= S with S = 0.5*sqrt(N^2/shift)
- magnitude = sqrt(re^2 + im^2 + 1e-10)  (criterions.py:111)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sepreformer_tpu.ops.framing import frame_signal


def make_stft_kernel(
    frame_length: int, frame_shift: int, window: str = "hann"
) -> np.ndarray:
    """Build the [frame_length, 2*(frame_length//2+1)] analysis matrix.

    Columns 0..nbins-1 are the real (cos) filters; columns nbins.. are the
    imaginary (-sin) filters, matching rfft of a unit impulse
    (criterions.py:57-60).
    """
    n = frame_length
    if window != "hann":
        raise ValueError(f"unsupported window {window!r}")
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))  # periodic hann
    if n // 4 == frame_shift:
        w = np.sqrt(2.0 / 3.0) * w
    elif n // 2 == frame_shift:
        w = np.sqrt(w)
    s = 0.5 * np.sqrt(n * n / frame_shift)
    nbins = n // 2 + 1
    grid = np.outer(np.arange(n), np.arange(nbins)) * (2.0 * np.pi / n)
    real = np.cos(grid) / s       # [n, nbins]
    imag = -np.sin(grid) / s
    return (np.concatenate([real, imag], axis=1) * w[:, None]).astype(np.float32)


def make_mel_filterbank(
    n_freqs: int,
    n_mels: int = 80,
    sample_rate: int = 16000,
    f_min: float = 0.0,
    f_max: float = None,
) -> np.ndarray:
    """Triangular mel filterbank [n_freqs, n_mels], matching
    ``torchaudio.transforms.MelScale`` defaults (HTK mel scale, no norm) —
    the reference's ``mel_opt`` loss frontend (criterions.py:133:
    ``MelScale(n_mels=80, sample_rate=16000, n_stft=frame_length/2+1)``;
    torchaudio is not importable in this environment, so the filterbank is
    built from the same published formula).

    Note the reference hardcodes ``sample_rate=16000`` even for the 8 kHz
    variants — kept for parity.
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)

    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    m_pts = np.linspace(hz2mel(f_min), hz2mel(f_max), n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]     # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up)).astype(np.float32)


def stft_magnitude(
    x: jnp.ndarray, kernel: jnp.ndarray, frame_shift: int
) -> jnp.ndarray:
    """Magnitude spectrogram of [B, T] -> [B, n_frames, nbins].

    Right-pads to a whole number of hops like the reference
    (criterions.py:89-97), then valid-frames with hop ``frame_shift``.
    """
    frame_length, twobins = kernel.shape
    nbins = twobins // 2
    b, t = x.shape
    padded = -(-t // frame_shift) * frame_shift
    if padded > t:
        x = jnp.pad(x, ((0, 0), (0, padded - t)))
    frames = frame_signal(x, frame_length, frame_shift)
    spec = jnp.einsum(
        "btk,kf->btf", frames, kernel.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    re, im = spec[..., :nbins], spec[..., nbins:]
    return jnp.sqrt(re * re + im * im + 1.0e-10)
