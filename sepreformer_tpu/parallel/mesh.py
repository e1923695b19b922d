"""Device mesh + sharding layout.

The reference's only parallelism is single-process DataParallel
(engine.py:64, scatter/gather per forward).  Here: a 2-D
``Mesh(('data', 'model'))`` over all chips/hosts.

- ``data`` shards the utterance batch; gradients are reduced implicitly by
  pjit (psum over ICI within a slice, DCN across slices).  This replaces
  DP/DDP.
- ``model`` (Large-DM variants, when activations exceed one chip's HBM)
  shards the separator's wide dims: attention heads (q/k/v output), FFN
  hidden (GCFN 6F), and the corresponding reduction dims of the
  down-projections.  Everything else is replicated.

Note on GLU layers: torch GLU splits channels contiguously (first/second
half), so sharding a GLU input over 'model' makes the two halves live on
different shards; GSPMD inserts the reshard.  This costs one
collective-permute per GCFN — acceptable for an HBM-capacity-driven
sharding of a 60M-param model, and avoided entirely at
model_parallel_size=1.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: int = 0,
    model: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Build a Mesh(('data','model')).  data=0 means 'all remaining'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == 0:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    need = data * model
    assert need <= n, f"mesh {data}x{model} needs {need} devices, have {n}"
    dev_array = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_spec() -> P:
    """mixture [B, T]"""
    return P("data", None)


def sources_spec() -> P:
    """sources [spks, B, T]"""
    return P(None, "data", None)


# Parameter-path patterns -> PartitionSpec factories.  Paths are
# '/'-joined flax param paths.  Order matters: first match wins.
_RULES: Tuple[Tuple[str, Any], ...] = (
    # MHA: q/k/v project onto the (sharded) head dim; out reduces over it
    (r".*/(q|k|v)/kernel$", lambda s: P(None, "model")),
    (r".*/(q|k|v)/bias$", lambda s: P("model")),
    (r".*/attn/out/kernel$", lambda s: P("model", None)),
    # GCFN / CLA / SpkSplit / OutputLayer: expand -> hidden sharded,
    # contract -> reduction sharded
    (r".*/proj_in/kernel$", lambda s: P(None, "model")),
    (r".*/proj_in/bias$", lambda s: P("model")),
    (r".*/proj_mid/kernel$", lambda s: P(None, "model")),
    (r".*/proj_mid/bias$", lambda s: P("model")),
    (r".*/gcfn/depthwise/kernel$", lambda s: P(None, None, "model")),
    (r".*/gcfn/proj_out/kernel$", lambda s: P("model", None)),
    (r".*/cla/proj_out/kernel$", lambda s: P("model", None)),
    (r".*/cla/bn/(scale|bias|mean|var)$", lambda s: P("model")),
)


def _spec_for(path: str, shape: Tuple[int, ...], model_size: int) -> P:
    if model_size > 1:
        for pattern, factory in _RULES:
            if re.match(pattern, path):
                spec = factory(shape)
                # only shard dims that divide evenly
                ok = all(
                    ax is None or shape[i] % model_size == 0
                    for i, ax in enumerate(spec)
                )
                if ok:
                    return spec
    return P()


def _path_str(key_path) -> str:
    parts = []
    for entry in key_path:
        if hasattr(entry, "key"):
            parts.append(str(entry.key))
        elif hasattr(entry, "idx"):
            parts.append(str(entry.idx))
        elif hasattr(entry, "name"):
            parts.append(str(entry.name))
        else:
            parts.append(str(entry))
    return "/".join(parts)


def param_specs(tree: Any, model_size: int) -> Any:
    """PartitionSpec pytree for any param-shaped tree.

    The same rules apply uniformly to params, batch_stats and the adam
    mu/nu trees inside opt_state, because their leaf paths end with the
    same module-path suffix the rules match on.
    """

    def map_fn(kp, leaf):
        shape = np.shape(leaf)
        if not shape:
            return P()
        return _spec_for(_path_str(kp), shape, model_size)

    return jax.tree_util.tree_map_with_path(map_fn, tree)


def shard_train_state(state: Any, mesh: Mesh, model_size: int) -> Any:
    """Device-put a full TrainState with the layout rules applied.

    Works in multi-process runs too: every process holds the full
    (identically-seeded) value of every leaf, so the global array is
    assembled by slicing the local copy per device shard
    (``make_array_from_callback``); single-process keeps the plain
    device_put fast path.
    """
    specs = param_specs(state, model_size)
    multiprocess = jax.process_count() > 1

    def put(leaf, spec):
        sharding = NamedSharding(mesh, spec)
        if not multiprocess:
            return jax.device_put(leaf, sharding)
        arr = np.asarray(leaf)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return jax.tree.map(put, state, specs)
