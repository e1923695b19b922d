"""Checkpoint save/resume with the reference's latest-epoch semantics.

The reference saves ``epoch.NNNN.pth`` dicts {epoch, model_state_dict,
optimizer_state_dict, train_loss, valid_loss} and auto-resumes from the
highest epoch found (utils/util_engine.py:12-47, 96-106).  Here: Orbax
checkpoints named ``epoch.NNNN`` holding the full TrainState plus host-side
scheduler state, same resume rule.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

_EPOCH_RE = re.compile(r"^epoch\.(\d+)$")


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(
    ckpt_dir: str,
    epoch: int,
    state: Any,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Save TrainState + host metadata under ``ckpt_dir/epoch.NNNN``."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), f"epoch.{epoch:04d}")
    payload = {
        "state": serialization.to_state_dict(state),
        "extra": dict(extra or {}),
        "epoch": epoch,
    }
    ocp = _ocp()
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, payload, force=True)
    return path


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    epochs = [
        int(m.group(1))
        for name in os.listdir(ckpt_dir)
        if (m := _EPOCH_RE.match(name))
    ]
    return max(epochs) if epochs else None


def load_checkpoint(
    ckpt_dir: str, state_template: Any, epoch: Optional[int] = None
) -> Optional[Tuple[Any, Dict[str, Any], int]]:
    """Restore the latest (or given) epoch.  Returns (state, extra, epoch)
    or None when no checkpoint exists."""
    ep = epoch if epoch is not None else latest_epoch(ckpt_dir)
    if ep is None:
        return None
    path = os.path.join(os.path.abspath(ckpt_dir), f"epoch.{ep:04d}")
    ocp = _ocp()
    ckpt = ocp.PyTreeCheckpointer()
    payload = ckpt.restore(path)
    state = serialization.from_state_dict(state_template, payload["state"])
    return state, dict(payload.get("extra", {})), ep
