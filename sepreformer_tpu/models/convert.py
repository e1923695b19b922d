"""PyTorch-checkpoint -> flax-params converter.

Maps the reference state_dict naming (models/<VARIANT>/model.py module tree)
onto this package's module tree.  Pure name/transpose mapping — needed for
the weight-parity goal (separated waveforms allclose on sample_WSJ.wav,
BASELINE.md) and used by the torch-parity tests.

Layout transforms:
- Linear [out, in]                  -> kernel [in, out]
- Conv1d 1x1 [out, in, 1]           -> kernel [in, out]
- depthwise Conv1d [C, 1, k]        -> kernel [k, 1, C]
- encoder Conv1d [N, 1, K]          -> kernel [K, N]
- ConvTranspose1d [N, 1, K]         -> kernel [N, K]
- LayerScale (1, 1, F)              -> scale (F,)
- norm weight/bias                  -> scale/bias
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from sepreformer_tpu.config import ModelConfig

Path = Tuple[str, ...]


def _t(w):  # torch tensor / numpy -> numpy
    if hasattr(w, "detach"):
        w = w.detach().cpu().numpy()
    return np.asarray(w)


def _linear(dst: Dict, path: Path, sd: Dict, key: str, bias: bool = True):
    _set(dst, path + ("kernel",), _t(sd[key + ".weight"]).T)
    if bias:
        _set(dst, path + ("bias",), _t(sd[key + ".bias"]))


def _conv1x1(dst: Dict, path: Path, sd: Dict, key: str, bias: bool = True):
    _set(dst, path + ("kernel",), _t(sd[key + ".weight"])[:, :, 0].T)
    if bias:
        _set(dst, path + ("bias",), _t(sd[key + ".bias"]))


def _depthwise(dst: Dict, path: Path, sd: Dict, key: str, bias: bool = True):
    _set(dst, path + ("kernel",), _t(sd[key + ".weight"]).transpose(2, 1, 0))
    if bias:
        _set(dst, path + ("bias",), _t(sd[key + ".bias"]))


def _norm(dst: Dict, path: Path, sd: Dict, key: str):
    _set(dst, path + ("scale",), _t(sd[key + ".weight"]))
    _set(dst, path + ("bias",), _t(sd[key + ".bias"]))


def _layer_scale(dst: Dict, path: Path, sd: Dict, key: str):
    _set(dst, path + ("scale",), _t(sd[key + ".layer_scale"]).reshape(-1))


def _bn_stats(dst: Dict, path: Path, sd: Dict, key: str):
    _set(dst, path + ("mean",), _t(sd[key + ".running_mean"]))
    _set(dst, path + ("var",), _t(sd[key + ".running_var"]))


def _set(dst: Dict, path: Path, value: np.ndarray):
    node = dst
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value.astype(np.float32)


def _mha(params: Dict, stats: Dict, path: Path, sd: Dict, key: str):
    """MultiHeadAttention (network.py:69-124)."""
    _norm(params, path + ("norm",), sd, key + ".layer_norm")
    _linear(params, path + ("q",), sd, key + ".linear_q")
    _linear(params, path + ("k",), sd, key + ".linear_k")
    _linear(params, path + ("v",), sd, key + ".linear_v")
    _linear(params, path + ("out",), sd, key + ".linear_out")
    _layer_scale(params, path + ("layer_scale",), sd, key + ".Layer_scale")


def _gcfn(params: Dict, stats: Dict, path: Path, sd: Dict, key: str):
    """GCFN (network.py:46-66): net1 = [LN, Linear], net2 = [GLU, Drop, Linear, Drop]."""
    _norm(params, path + ("norm",), sd, key + ".net1.0")
    _linear(params, path + ("proj_in",), sd, key + ".net1.1")
    _depthwise(params, path + ("depthwise",), sd, key + ".depthwise")
    _linear(params, path + ("proj_out",), sd, key + ".net2.2")
    _layer_scale(params, path + ("layer_scale",), sd, key + ".Layer_scale")


def _cla(params: Dict, stats: Dict, path: Path, sd: Dict, key: str):
    """CLA (network.py:159-187)."""
    _norm(params, path + ("norm",), sd, key + ".layer_norm")
    _linear(params, path + ("proj_in",), sd, key + ".linear1")
    _depthwise(params, path + ("depthwise",), sd, key + ".dw_conv_1d")
    _linear(params, path + ("proj_mid",), sd, key + ".linear2")
    _norm(params, path + ("bn",), sd, key + ".BN")
    _bn_stats(stats, path + ("bn",), sd, key + ".BN")
    _linear(params, path + ("proj_out",), sd, key + ".linear3.1")
    _layer_scale(params, path + ("layer_scale",), sd, key + ".Layer_scale")


def _global_block(params, stats, path: Path, sd, key: str):
    """GlobalBlock = EGA + GCFN (network.py:189-209)."""
    ega = key + ".block.ega.block"
    _mha(params, stats, path + ("ega", "attn"), sd, ega + ".self_attn")
    _norm(params, path + ("ega", "gate_norm"), sd, ega + ".linear.0")
    _linear(params, path + ("ega", "gate_proj"), sd, ega + ".linear.1")
    _gcfn(params, stats, path + ("gcfn",), sd, key + ".block.gcfn")


def _local_block(params, stats, path: Path, sd, key: str):
    _cla(params, stats, path + ("cla",), sd, key + ".block.cla")
    _gcfn(params, stats, path + ("gcfn",), sd, key + ".block.gcfn")


def _spk_attention(params, stats, path: Path, sd, key: str):
    _mha(params, stats, path + ("attn",), sd, key + ".self_attn")
    _gcfn(params, stats, path + ("gcfn",), sd, key + ".feed_forward")


def _enc_stage(params, stats, path: Path, sd, key: str, down: bool):
    for i in (1, 2):
        _global_block(params, stats, path + (f"global_{i}",), sd, f"{key}.g_block_{i}")
        _local_block(params, stats, path + (f"local_{i}",), sd, f"{key}.l_block_{i}")
    if down:
        _depthwise(params, path + ("down", "conv"), sd, key + ".downconv.down_conv")
        _norm(params, path + ("down", "bn"), sd, key + ".downconv.BN")
        _bn_stats(stats, path + ("down", "bn"), sd, key + ".downconv.BN")


def _dec_stage(params, stats, path: Path, sd, key: str):
    for i in (1, 2, 3):
        _global_block(params, stats, path + (f"global_{i}",), sd, f"{key}.g_block_{i}")
        _local_block(params, stats, path + (f"local_{i}",), sd, f"{key}.l_block_{i}")
        _spk_attention(params, stats, path + (f"spk_attn_{i}",), sd, f"{key}.spk_attn_{i}")


def _spk_split(params, stats, path: Path, sd, key: str):
    """SpkSplitStage (module.py:110-125): linear = [Conv1x1, GLU, Conv1x1]."""
    _conv1x1(params, path + ("proj_in",), sd, key + ".linear.0")
    _conv1x1(params, path + ("proj_out",), sd, key + ".linear.2")
    _norm(params, path + ("norm",), sd, key + ".norm")


def _output_layer(params, stats, path: Path, sd, key: str):
    _linear(params, path + ("proj_in",), sd, key + ".end_conv1x1.0")
    _linear(params, path + ("proj_out",), sd, key + ".end_conv1x1.2")


def convert_torch_state_dict(
    sd: Dict[str, Any], cfg: ModelConfig
) -> Dict[str, Dict]:
    """Convert a reference-model state_dict into flax variables
    {'params': ..., 'batch_stats': ...}."""
    params: Dict = {}
    stats: Dict = {}

    _set(params, ("audio_encoder", "kernel"),
         _t(sd["audio_encoder.conv1d.weight"])[:, 0, :].T)
    _norm(params, ("feature_projector", "norm"), sd, "feature_projector.norm")
    _set(params, ("feature_projector", "proj", "kernel"),
         _t(sd["feature_projector.conv1d.weight"])[:, :, 0].T)

    sep = ("separator",)
    _set(params, sep + ("pos_emb", "pe_k"), _t(sd["separator.pos_emb.pe_k.weight"]))
    for s in range(cfg.num_stages):
        _enc_stage(params, stats, sep + (f"enc_{s}",), sd,
                   f"separator.enc_stages.{s}", down=True)
    _enc_stage(params, stats, sep + ("bottleneck",), sd,
               "separator.bottleneck_G", down=False)
    if cfg.per_stage_spk_split:
        # Large_DM_WHAM: ModuleList of num_stages+1 independent blocks
        for s in range(cfg.num_stages + 1):
            _spk_split(params, stats, sep + (f"spk_split_{s}",), sd,
                       f"separator.spk_split_block.{s}")
    else:
        _spk_split(params, stats, sep + ("spk_split",), sd,
                   "separator.spk_split_block")
    for s in range(cfg.num_stages):
        _conv1x1(params, sep + (f"fusion_{s}",), sd, f"separator.simple_fusion.{s}")
        _dec_stage(params, stats, sep + (f"dec_{s}",), sd, f"separator.dec_stages.{s}")

    _output_layer(params, stats, ("out_layer",), sd, "out_layer")
    _set(params, ("audio_decoder", "kernel"), _t(sd["audio_decoder.weight"])[:, 0, :])
    for s in range(cfg.num_stages):
        _output_layer(params, stats, (f"aux_out_layer_{s}",), sd, f"out_layer_bn.{s}")
        _set(params, (f"aux_decoder_{s}", "kernel"),
             _t(sd[f"decoder_bn.{s}.weight"])[:, 0, :])

    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str, cfg: ModelConfig) -> Dict[str, Dict]:
    """Load a reference ``epoch.NNNN.pth`` (dict with 'model_state_dict',
    ref: utils/util_engine.py:96-106) and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return convert_torch_state_dict(sd, cfg)
