"""SepReformer-TPU: a TPU-native speech-separation framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
SepReformer ("Separate and Reconstruct: Asymmetric Encoder-Decoder for
Speech Separation", NeurIPS 2024) re-designed TPU-first:

- one parameterized model family (T/S/B/M/L) instead of per-variant clones
- channels-last [B, T, F] layout so the feature dim rides the TPU lane axis
- static-shape, fully jittable forward/train steps (bucketed eval)
- data/model parallelism via jax.sharding.Mesh + NamedSharding
- Pallas kernels for the conv front-end/back-end and fused loss

Reference behavior documented against dmlguq456/SepReformer (see SURVEY.md).
"""

__version__ = "0.1.0"

from sepreformer_tpu.config import (  # noqa: F401
    ModelConfig,
    VariantConfig,
    get_variant,
)


def load_separator(*args, **kwargs):  # noqa: D103 — lazy: jax import is slow
    from sepreformer_tpu.api import load_separator as _impl

    return _impl(*args, **kwargs)
