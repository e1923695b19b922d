"""One-call library API.

The reference offers no library entry point — its only inference path is
``python run.py --engine-mode infer_sample`` (run.py:5-28, engine.py:152).
This module is the importable equivalent:

    from sepreformer_tpu import load_separator
    sep = load_separator("SepReformer_Base_WSJ0", checkpoint="epoch.0180.pth")
    sources = sep("mixture.wav")          # list of [T] float32 arrays
    sources = sep(waveform_array)         # or raw samples at the model rate

Checkpoints: a reference ``.pth`` (converted on load), an orbax workdir
trained here (latest epoch), or None (random init, for smoke tests).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Union

import numpy as np

from sepreformer_tpu.config import VariantConfig, get_variant


@dataclass
class Separator:
    """Callable separation frontend; jit-compiled per padded length bucket."""

    variant: VariantConfig
    params: dict
    batch_stats: dict
    chunk_seconds: Optional[float] = None
    length_bucket: int = 4000
    _forward: object = field(default=None, repr=False)

    def __post_init__(self):
        from sepreformer_tpu.engine.train import make_forward_fn

        self._forward = make_forward_fn(self.variant)

    @property
    def sampling_rate(self) -> int:
        return self.variant.dataset.sampling_rate

    def __call__(
        self, mixture: Union[str, np.ndarray]
    ) -> List[np.ndarray]:
        """Separate one utterance -> list of per-speaker [T] arrays.

        A path is loaded (and resampled) at the model rate; an array is
        taken as raw samples at the model rate.
        """
        import jax.numpy as jnp

        if isinstance(mixture, (str, os.PathLike)):
            from sepreformer_tpu.data.audio import read_wav

            wav, _ = read_wav(str(mixture), sr=self.sampling_rate)
        else:
            wav = np.asarray(mixture, np.float32)
            if wav.ndim != 1:
                raise ValueError(f"expected [T] samples, got {wav.shape}")
        if self.variant.engine.mvn:
            # match Engine._prep's eval preprocessing (engine.py:151-154;
            # ref utils/functions.py:1-4) — normalize the raw utterance
            # before any padding so the statistics see only real samples
            wav = (wav - wav.mean()) / (wav.std() + 1e-8)
        t = len(wav)
        stride = self.variant.model.enc_stride
        sr = self.sampling_rate
        chunk_len = (int(self.chunk_seconds * sr) if self.chunk_seconds
                     else 0)
        if chunk_len and t > chunk_len:
            from sepreformer_tpu.serving import separate_chunked

            chunk_len -= chunk_len % stride

            def forward_batch(batch):
                out = self._forward(self.params, self.batch_stats,
                                    jnp.asarray(batch))
                return np.asarray(out).transpose(1, 0, 2)

            audio = separate_chunked(forward_batch, wav, chunk_len)
            return [audio[i] for i in range(audio.shape[0])]
        # pad to a length bucket so repeated calls reuse compiles, then to
        # the encoder stride (engine.py:155-163 semantics)
        bucket = max(self.length_bucket, 1)
        padded = -(-t // bucket) * bucket
        padded += (-padded) % stride
        x = np.zeros((1, padded), np.float32)
        x[0, :t] = wav
        # masked exact-eval: bucket padding must be invisible (same
        # guarantee Engine._test gives).  True length goes in
        # unconditionally — the Pallas kernels consume the mask in-kernel
        # (round 3), masks are numeric no-ops for exact-fit calls, and
        # one lens-carrying executable serves every call at this bucket
        # (no second masked/unmasked compile)
        audio = np.asarray(
            self._forward(self.params, self.batch_stats, jnp.asarray(x),
                          jnp.asarray([t], jnp.int32))
        )[:, 0, :t]
        return [audio[i] for i in range(audio.shape[0])]


def load_separator(
    variant: Union[str, VariantConfig] = "SepReformer_Base_WSJ0",
    checkpoint: Optional[str] = None,
    chunk_seconds: Optional[float] = None,
    seed: int = 0,
) -> Separator:
    """Build a ready-to-call :class:`Separator`.

    ``checkpoint``: a reference ``.pth`` file (converted via
    models/convert.py), an orbax checkpoint directory created by the
    Engine (``<workdir>/log/scratch_weights`` or a specific
    ``epoch.NNNN``), or None for random init.
    """
    cfg = get_variant(variant) if isinstance(variant, str) else variant

    params = batch_stats = None
    if checkpoint and checkpoint.endswith((".pth", ".pt", ".pkl")):
        from sepreformer_tpu.models.convert import load_torch_checkpoint

        variables = load_torch_checkpoint(checkpoint, cfg.model)
        params, batch_stats = variables["params"], variables["batch_stats"]
    else:
        import jax

        from sepreformer_tpu.engine.train import create_train_state

        state = create_train_state(cfg, jax.random.key(seed))
        if checkpoint:
            from sepreformer_tpu.engine.checkpoint import (
                latest_epoch,
                load_checkpoint,
            )

            ckpt_dir = checkpoint
            if latest_epoch(ckpt_dir) is None and os.path.isdir(ckpt_dir):
                # a specific epoch.NNNN dir: point the loader at its parent
                parent = os.path.dirname(os.path.abspath(ckpt_dir))
                if latest_epoch(parent) is not None:
                    ckpt_dir = parent
            restored = load_checkpoint(ckpt_dir, state)
            if restored is None:
                raise FileNotFoundError(
                    f"no epoch.NNNN checkpoints under {checkpoint!r}"
                )
            state = restored[0]
        params, batch_stats = state.params, state.batch_stats

    return Separator(
        variant=cfg, params=params, batch_stats=batch_stats,
        chunk_seconds=chunk_seconds,
    )
