"""Name-driven criterion/optimizer/scheduler factories.

The reference selects components by class name from the YAML config via
reflection over torch.nn / torch.optim / torch.optim.lr_scheduler with a
fallback to its own implementations (utils/util_implement.py:9-64).  The
TPU equivalent resolves names onto optax constructs and this package's
loss callables, so reference configs.yaml files drive the same choices.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Sequence

import numpy as np
import optax

from sepreformer_tpu.config import VariantConfig


def _adamw(cfg: VariantConfig, kw: Dict[str, Any]):
    return optax.chain(
        optax.clip_by_global_norm(cfg.optim.clip_norm),
        optax.scale_by_adam(
            b1=kw.get("betas", (0.9, 0.999))[0],
            b2=kw.get("betas", (0.9, 0.999))[1],
            eps=kw.get("eps", 1e-8),
        ),
        optax.add_decayed_weights(kw.get("weight_decay", 1e-2)),
        optax.scale(-1.0),  # lr injected per step (engine/train.py)
    )


def _adam(cfg: VariantConfig, kw: Dict[str, Any]):
    return optax.chain(
        optax.clip_by_global_norm(cfg.optim.clip_norm),
        optax.scale_by_adam(
            b1=kw.get("betas", (0.9, 0.999))[0],
            b2=kw.get("betas", (0.9, 0.999))[1],
            eps=kw.get("eps", 1e-8),
        ),
        optax.scale(-1.0),
    )


def _sgd(cfg: VariantConfig, kw: Dict[str, Any]):
    momentum = kw.get("momentum", 0.0)
    parts = [optax.clip_by_global_norm(cfg.optim.clip_norm)]
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=kw.get("nesterov", False)))
    parts.append(optax.scale(-1.0))
    return optax.chain(*parts)


_OPTIMIZERS: Dict[str, Callable] = {
    "AdamW": _adamw,
    "Adam": _adam,
    "SGD": _sgd,
}


def make_optimizer_by_name(
    cfg: VariantConfig, name: str = "AdamW", **kwargs
) -> optax.GradientTransformation:
    """Resolve an optimizer by its torch-style class name
    (util_implement.py:13-22 behavior)."""
    if name not in _OPTIMIZERS:
        raise KeyError(
            f"unknown optimizer {name!r}; available: {sorted(_OPTIMIZERS)}"
        )
    return _OPTIMIZERS[name](cfg, kwargs)


def make_criterions(cfg: VariantConfig) -> Dict[str, Callable]:
    """The reference's four criterions in its fixed unpack order
    (engine.py:26): PIT_SISNR_mag, PIT_SISNR_time, PIT_SISNRi, PIT_SDRi."""
    import jax.numpy as jnp

    from sepreformer_tpu.losses import (
        pit_sisnr_improvement,
        pit_sisnr_mag,
        pit_sisnr_time,
    )
    from sepreformer_tpu.metrics import sdri_np
    from sepreformer_tpu.ops.stft import make_stft_kernel

    # numpy constant (host-side embed at lowering, no device fetch)
    kernel = np.asarray(
        make_stft_kernel(
            cfg.criterion.stft.frame_length,
            cfg.criterion.stft.frame_shift,
            cfg.criterion.stft.window,
        )
    )
    return {
        "PIT_SISNR_mag": functools.partial(
            pit_sisnr_mag,
            stft_kernel=kernel,
            frame_shift=cfg.criterion.stft.frame_shift,
            scale_inv=cfg.criterion.scale_inv,
        ),
        "PIT_SISNR_time": functools.partial(
            pit_sisnr_time, scale_inv=cfg.criterion.scale_inv
        ),
        "PIT_SISNRi": pit_sisnr_improvement,
        "PIT_SDRi": sdri_np,
    }


def make_lr_controller(cfg: VariantConfig, names: Sequence[str] = (
    "ReduceLROnPlateau", "WarmupConstantSchedule",
)):
    """Scheduler factory: the reference composes ReduceLROnPlateau +
    WarmupConstantSchedule (configs.yaml:120-128); both live in one
    host-side LRController here."""
    from sepreformer_tpu.engine.lr_control import LRController

    known = {"ReduceLROnPlateau", "WarmupConstantSchedule"}
    unknown = set(names) - known
    if unknown:
        raise KeyError(f"unknown schedulers {sorted(unknown)}")
    return LRController(
        base_lr=cfg.optim.lr,
        warmup_steps=(
            cfg.optim.warmup_steps if "WarmupConstantSchedule" in names else 0
        ),
        plateau_factor=(
            cfg.optim.plateau_factor if "ReduceLROnPlateau" in names else 1.0
        ),
        plateau_patience=cfg.optim.plateau_patience,
        min_lr=cfg.optim.plateau_min_lr,
    )
