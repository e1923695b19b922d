"""Waveform framing, strided-conv front-end and overlap-add back-end.

TPU-first design: a Conv1d(1 -> N, kernel=K, stride=S) over a raw waveform is
an im2col + one [.., K] x [K, N] matmul.  When ``K % S == 0`` (SepReformer:
K=16, S=4) the im2col is *free*: reshape the signal into S-sample polyphase
groups and concatenate K//S shifted views — no gather, no conv lowering, and
the matmul lands on the MXU.  The transposed-conv decoder is the exact
adjoint: one matmul producing K-sample frames followed by a polyphase
overlap-add composed of K//S shifted adds.

Behavioral reference: ``AudioEncoder`` (modules/module.py:12-23, torch
Conv1d(1,256,16,stride=4,bias=False)) and ``AudioDecoder``
(modules/module.py:268-283, ConvTranspose1d(256,1,16,stride=4,bias=False)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_signal(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """Extract overlapping frames [B, T', kernel] from [B, T].

    T' = (T - kernel)//stride + 1.  Requires kernel % stride == 0 and
    T % stride == 0 (the data pipeline truncates to a stride multiple,
    ref: dataset.py:148-151).
    """
    if kernel % stride != 0:
        raise ValueError(f"kernel {kernel} must be a multiple of stride {stride}")
    b, t = x.shape
    if t % stride != 0:
        raise ValueError(f"signal length {t} must be a multiple of stride {stride}")
    groups = x.reshape(b, t // stride, stride)          # polyphase view
    n_frames = (t - kernel) // stride + 1
    k_groups = kernel // stride
    # frame i = concat(groups[i], groups[i+1], ..., groups[i+k_groups-1])
    parts = [groups[:, j : j + n_frames] for j in range(k_groups)]
    return jnp.concatenate(parts, axis=-1)


def encoder_conv(x: jnp.ndarray, weight: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Strided conv front-end as framing + matmul.

    x: [B, T] waveform; weight: [kernel, N]. Returns [B, T', N]
    (channels-last — N rides the TPU lane dimension).
    """
    kernel, _ = weight.shape
    frames = frame_signal(x, kernel, stride)
    return jnp.einsum(
        "btk,kn->btn", frames, weight, preferred_element_type=frames.dtype
    )


def decoder_overlap_add(
    h: jnp.ndarray, weight: jnp.ndarray, stride: int
) -> jnp.ndarray:
    """Transposed-conv back-end as matmul + polyphase overlap-add.

    h: [B, T', N] frame features; weight: [N, kernel].  Returns [B, T]
    with T = (T'-1)*stride + kernel, identical to ConvTranspose1d
    (modules/module.py:268-283).
    """
    n, kernel = weight.shape
    if kernel % stride != 0:
        raise ValueError(f"kernel {kernel} must be a multiple of stride {stride}")
    b, t_frames, _ = h.shape
    frames = jnp.einsum("btn,nk->btk", h, weight, preferred_element_type=h.dtype)
    k_groups = kernel // stride
    t_out = (t_frames - 1) * stride + kernel
    n_groups_out = t_out // stride
    # output polyphase group g accumulates frames[g - j, j*stride:(j+1)*stride]
    # for j in [0, k_groups): k_groups shifted adds instead of a scatter.
    frames = frames.reshape(b, t_frames, k_groups, stride)
    out = jnp.zeros((b, n_groups_out, stride), dtype=h.dtype)
    for j in range(k_groups):
        out = out.at[:, j : j + t_frames].add(frames[:, :, j])
    return out.reshape(b, t_out)
