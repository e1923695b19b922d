"""Bidirectional PyTorch ⇄ flax checkpoint converter.

One explicit mapping table ties the reference state_dict naming
(models/<VARIANT>/model.py module tree in dmlguq456/SepReformer) to this
package's module tree; both directions derive from it:

- ``convert_torch_state_dict`` (torch → flax): weight-parity loading of
  reference ``epoch.NNNN.pth`` files (BASELINE.md allclose goal; used by
  the torch-parity tests).
- ``export_torch_state_dict`` (flax → torch): models trained here can be
  taken back to the reference codebase (its ``load_last_checkpoint``
  loads with strict=False, util_engine.py:43).

Layout transforms (torch ↔ flax):
- Linear [out, in]                  ↔ kernel [in, out]
- Conv1d 1x1 [out, in, 1]           ↔ kernel [in, out]
- depthwise Conv1d [C, 1, k]        ↔ kernel [k, 1, C]
- encoder Conv1d [N, 1, K]          ↔ kernel [K, N]
- ConvTranspose1d [N, 1, K]         ↔ kernel [N, K]
- LayerScale (1, 1, F)              ↔ scale (F,)  (network.py:7-18, dims=3)
- norm weight/bias                  ↔ scale/bias
- BN running_mean/var               ↔ batch_stats mean/var
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, NamedTuple, Tuple

import numpy as np

from sepreformer_tpu.config import ModelConfig

Path = Tuple[str, ...]


class Entry(NamedTuple):
    kind: str          # transform name, see _FWD/_INV
    collection: str    # "params" | "batch_stats"
    path: Path         # flax variable path
    key: str           # torch state_dict key


_FWD: Dict[str, Callable[[np.ndarray], np.ndarray]] = {
    "identity": lambda t: t,
    "linear_w": lambda t: t.T,
    "conv1x1_w": lambda t: t[:, :, 0].T,
    "depthwise_w": lambda t: t.transpose(2, 1, 0),
    "enc_conv_w": lambda t: t[:, 0, :].T,
    "dec_conv_w": lambda t: t[:, 0, :],
    "layer_scale": lambda t: t.reshape(-1),
}

_INV: Dict[str, Callable[[np.ndarray], np.ndarray]] = {
    "identity": lambda a: a,
    "linear_w": lambda a: a.T,
    "conv1x1_w": lambda a: a.T[:, :, None],
    "depthwise_w": lambda a: a.transpose(2, 1, 0),
    "enc_conv_w": lambda a: a.T[:, None, :],
    "dec_conv_w": lambda a: a[:, None, :],
    "layer_scale": lambda a: a.reshape(1, 1, -1),
}


# --------------------------------------------------------------------------
# mapping table
# --------------------------------------------------------------------------


def _linear(out: List[Entry], path: Path, key: str, bias: bool = True):
    out.append(Entry("linear_w", "params", path + ("kernel",), key + ".weight"))
    if bias:
        out.append(Entry("identity", "params", path + ("bias",), key + ".bias"))


def _conv1x1(out: List[Entry], path: Path, key: str, bias: bool = True):
    out.append(Entry("conv1x1_w", "params", path + ("kernel",), key + ".weight"))
    if bias:
        out.append(Entry("identity", "params", path + ("bias",), key + ".bias"))


def _depthwise(out: List[Entry], path: Path, key: str, bias: bool = True):
    out.append(Entry("depthwise_w", "params", path + ("kernel",), key + ".weight"))
    if bias:
        out.append(Entry("identity", "params", path + ("bias",), key + ".bias"))


def _norm(out: List[Entry], path: Path, key: str):
    out.append(Entry("identity", "params", path + ("scale",), key + ".weight"))
    out.append(Entry("identity", "params", path + ("bias",), key + ".bias"))


def _layer_scale(out: List[Entry], path: Path, key: str):
    out.append(Entry("layer_scale", "params", path + ("scale",),
                     key + ".layer_scale"))


def _bn_stats(out: List[Entry], path: Path, key: str):
    out.append(Entry("identity", "batch_stats", path + ("mean",),
                     key + ".running_mean"))
    out.append(Entry("identity", "batch_stats", path + ("var",),
                     key + ".running_var"))


def _mha(out: List[Entry], path: Path, key: str):
    """MultiHeadAttention (network.py:69-124)."""
    _norm(out, path + ("norm",), key + ".layer_norm")
    _linear(out, path + ("q",), key + ".linear_q")
    _linear(out, path + ("k",), key + ".linear_k")
    _linear(out, path + ("v",), key + ".linear_v")
    _linear(out, path + ("out",), key + ".linear_out")
    _layer_scale(out, path + ("layer_scale",), key + ".Layer_scale")


def _gcfn(out: List[Entry], path: Path, key: str):
    """GCFN (network.py:46-66): net1 = [LN, Linear], net2 = [GLU, Drop, Linear, Drop]."""
    _norm(out, path + ("norm",), key + ".net1.0")
    _linear(out, path + ("proj_in",), key + ".net1.1")
    _depthwise(out, path + ("depthwise",), key + ".depthwise")
    _linear(out, path + ("proj_out",), key + ".net2.2")
    _layer_scale(out, path + ("layer_scale",), key + ".Layer_scale")


def _cla(out: List[Entry], path: Path, key: str):
    """CLA (network.py:159-187)."""
    _norm(out, path + ("norm",), key + ".layer_norm")
    _linear(out, path + ("proj_in",), key + ".linear1")
    _depthwise(out, path + ("depthwise",), key + ".dw_conv_1d")
    _linear(out, path + ("proj_mid",), key + ".linear2")
    _norm(out, path + ("bn",), key + ".BN")
    _bn_stats(out, path + ("bn",), key + ".BN")
    _linear(out, path + ("proj_out",), key + ".linear3.1")
    _layer_scale(out, path + ("layer_scale",), key + ".Layer_scale")


def _global_block(out: List[Entry], path: Path, key: str):
    """GlobalBlock = EGA + GCFN (network.py:189-209)."""
    ega = key + ".block.ega.block"
    _mha(out, path + ("ega", "attn"), ega + ".self_attn")
    _norm(out, path + ("ega", "gate_norm"), ega + ".linear.0")
    _linear(out, path + ("ega", "gate_proj"), ega + ".linear.1")
    _gcfn(out, path + ("gcfn",), key + ".block.gcfn")


def _local_block(out: List[Entry], path: Path, key: str):
    _cla(out, path + ("cla",), key + ".block.cla")
    _gcfn(out, path + ("gcfn",), key + ".block.gcfn")


def _spk_attention(out: List[Entry], path: Path, key: str):
    _mha(out, path + ("attn",), key + ".self_attn")
    _gcfn(out, path + ("gcfn",), key + ".feed_forward")


def _enc_stage(out: List[Entry], path: Path, key: str, down: bool):
    for i in (1, 2):
        _global_block(out, path + (f"global_{i}",), f"{key}.g_block_{i}")
        _local_block(out, path + (f"local_{i}",), f"{key}.l_block_{i}")
    if down:
        _depthwise(out, path + ("down", "conv"), key + ".downconv.down_conv")
        _norm(out, path + ("down", "bn"), key + ".downconv.BN")
        _bn_stats(out, path + ("down", "bn"), key + ".downconv.BN")


def _dec_stage(out: List[Entry], path: Path, key: str):
    for i in (1, 2, 3):
        _global_block(out, path + (f"global_{i}",), f"{key}.g_block_{i}")
        _local_block(out, path + (f"local_{i}",), f"{key}.l_block_{i}")
        _spk_attention(out, path + (f"spk_attn_{i}",), f"{key}.spk_attn_{i}")


def _spk_split(out: List[Entry], path: Path, key: str):
    """SpkSplitStage (module.py:110-125): linear = [Conv1x1, GLU, Conv1x1]."""
    _conv1x1(out, path + ("proj_in",), key + ".linear.0")
    _conv1x1(out, path + ("proj_out",), key + ".linear.2")
    _norm(out, path + ("norm",), key + ".norm")


def _output_layer(out: List[Entry], path: Path, key: str):
    _linear(out, path + ("proj_in",), key + ".end_conv1x1.0")
    _linear(out, path + ("proj_out",), key + ".end_conv1x1.2")


def mapping_entries(cfg: ModelConfig) -> List[Entry]:
    """The full flax-path ↔ torch-key table for one model configuration."""
    out: List[Entry] = []
    out.append(Entry("enc_conv_w", "params", ("audio_encoder", "kernel"),
                     "audio_encoder.conv1d.weight"))
    _norm(out, ("feature_projector", "norm"), "feature_projector.norm")
    out.append(Entry("conv1x1_w", "params",
                     ("feature_projector", "proj", "kernel"),
                     "feature_projector.conv1d.weight"))

    sep = ("separator",)
    out.append(Entry("identity", "params", sep + ("pos_emb", "pe_k"),
                     "separator.pos_emb.pe_k.weight"))
    if cfg.embed_v:
        # embed_v=True creates pe_v in the reference (module.py:50); no
        # variant ships with it and the attention math never consumes it
        # (network.py MHA takes pos_k only) — parameter-parity only
        out.append(Entry("identity", "params", sep + ("pos_emb", "pe_v"),
                         "separator.pos_emb.pe_v.weight"))
    for s in range(cfg.num_stages):
        _enc_stage(out, sep + (f"enc_{s}",), f"separator.enc_stages.{s}",
                   down=True)
    _enc_stage(out, sep + ("bottleneck",), "separator.bottleneck_G",
               down=False)
    if cfg.per_stage_spk_split:
        # Large_DM_WHAM: ModuleList of num_stages+1 independent blocks
        # (SepReformer_Large_DM_WHAM/modules/module.py:181-184)
        for s in range(cfg.num_stages + 1):
            _spk_split(out, sep + (f"spk_split_{s}",),
                       f"separator.spk_split_block.{s}")
    else:
        _spk_split(out, sep + ("spk_split",), "separator.spk_split_block")
    for s in range(cfg.num_stages):
        _conv1x1(out, sep + (f"fusion_{s}",), f"separator.simple_fusion.{s}")
        _dec_stage(out, sep + (f"dec_{s}",), f"separator.dec_stages.{s}")

    _output_layer(out, ("out_layer",), "out_layer")
    out.append(Entry("dec_conv_w", "params", ("audio_decoder", "kernel"),
                     "audio_decoder.weight"))
    for s in range(cfg.num_stages):
        _output_layer(out, (f"aux_out_layer_{s}",), f"out_layer_bn.{s}")
        out.append(Entry("dec_conv_w", "params",
                         (f"aux_decoder_{s}", "kernel"),
                         f"decoder_bn.{s}.weight"))
    return out


# --------------------------------------------------------------------------
# conversion
# --------------------------------------------------------------------------


def _t(w):  # torch tensor / numpy -> numpy
    if hasattr(w, "detach"):
        w = w.detach().cpu().numpy()
    return np.asarray(w)


def _set(dst: Dict, path: Path, value: np.ndarray):
    node = dst
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value.astype(np.float32)


def _get(src: Dict, path: Path) -> np.ndarray:
    node = src
    for p in path:
        node = node[p]
    return np.asarray(node)


def convert_torch_state_dict(
    sd: Dict[str, Any], cfg: ModelConfig
) -> Dict[str, Dict]:
    """Convert a reference-model state_dict into flax variables
    {'params': ..., 'batch_stats': ...}."""
    out = {"params": {}, "batch_stats": {}}
    for kind, coll, path, key in mapping_entries(cfg):
        _set(out[coll], path, _FWD[kind](_t(sd[key])))
    return out


def export_torch_state_dict(
    variables: Dict[str, Dict], cfg: ModelConfig
) -> Dict[str, np.ndarray]:
    """Convert flax variables back into a reference-model state_dict
    (numpy values; pass through ``torch.from_numpy`` to load).  BatchNorm
    ``num_batches_tracked`` buffers are emitted as 0."""
    sd: Dict[str, np.ndarray] = {}
    for kind, coll, path, key in mapping_entries(cfg):
        sd[key] = _INV[kind](_get(variables[coll], path)).astype(np.float32)
        if key.endswith(".running_var"):
            sd[key[: -len(".running_var")] + ".num_batches_tracked"] = (
                np.asarray(0, np.int64)
            )
    return sd


def load_torch_checkpoint(path: str, cfg: ModelConfig) -> Dict[str, Dict]:
    """Load a reference ``epoch.NNNN.pth`` (dict with 'model_state_dict',
    ref: utils/util_engine.py:96-106) and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return convert_torch_state_dict(sd, cfg)


def save_torch_checkpoint(
    path: str,
    variables: Dict[str, Dict],
    cfg: ModelConfig,
    epoch: int = 0,
    train_loss: float = 0.0,
    valid_loss: float = 0.0,
    lr: float = 1.0e-3,
    weight_decay: float = 1.0e-2,
) -> None:
    """Write a reference-format ``epoch.NNNN.pth`` the reference engine can
    resume from (util_engine.py:96-106 schema).

    The reference's ``load_last_checkpoint`` (util_engine.py:44)
    unconditionally calls ``optimizer.load_state_dict``, which raises on an
    empty dict, so a minimally valid AdamW state is emitted: empty
    per-parameter state (moments re-initialize lazily on the first
    ``step()``) and one param_group covering every trainable parameter with
    the reference's AdamW hyperparameters (configs.yaml:115-118; pass
    ``lr``/``weight_decay`` to match the variant being exported)."""
    import torch

    sd = {
        k: (torch.from_numpy(np.ascontiguousarray(v)) if np.ndim(v) else
            torch.tensor(v))
        for k, v in export_torch_state_dict(variables, cfg).items()
    }
    n_params = sum(
        1 for kind, coll, _, _ in mapping_entries(cfg) if coll == "params"
    )
    opt_sd = {
        "state": {},
        "param_groups": [{
            "lr": lr,
            "betas": (0.9, 0.999),
            "eps": 1.0e-8,
            "weight_decay": weight_decay,
            "amsgrad": False,
            "maximize": False,
            "foreach": None,
            "capturable": False,
            "differentiable": False,
            "fused": None,
            "params": list(range(n_params)),
        }],
    }
    torch.save(
        {
            "epoch": epoch,
            "model_state_dict": sd,
            "optimizer_state_dict": opt_sd,
            "train_loss": train_loss,
            "valid_loss": valid_loss,
        },
        path,
    )
