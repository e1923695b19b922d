"""Typed configuration system.

Replaces the reference's per-variant ``configs.yaml`` clones
(``models/<VARIANT>/configs.yaml`` in dmlguq456/SepReformer) with one
canonical dataclass schema plus named presets.  A loader for the reference
YAML schema is provided for drop-in familiarity
(ref: ``utils/util_system.py:11`` ``parse_yaml``).
"""

from __future__ import annotations

import dataclasses
import pathlib
from dataclasses import dataclass, field, replace
from typing import Any, Dict, List, Optional, Sequence, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Network hyperparameters.

    Mirrors the knobs of the reference model tree
    (ref: ``models/SepReformer_Base_WSJ0/configs.yaml:30-93``) with the
    clone-specific duplication collapsed.
    """

    num_stages: int = 4           # R: down/up stages (configs.yaml:31)
    num_spks: int = 2
    enc_dim: int = 256            # N: encoder channels (configs.yaml:35)
    enc_kernel: int = 16          # L (configs.yaml:36)
    enc_stride: int = 4           # S (configs.yaml:37)
    feat_dim: int = 128           # F: separator width (configs.yaml:43)
    num_heads: int = 8            # MHA heads (configs.yaml:49)
    pos_maxlen: int = 2000        # rel-pos table half-size (configs.yaml:51)
    embed_v: bool = False         # rel-pos values (unused in all variants)
    local_kernel: int = 65        # CLA depthwise kernel (configs.yaml:60)
    down_kernel: int = 5          # DownConvLayer kernel (configs.yaml:65)
    dropout: float = 0.05         # Base 0.05 / Large 0.1
    layer_scale_init: float = 1.0e-5
    # Large_DM_WHAM uses num_stages+1 independent SpkSplit blocks instead of
    # one shared block (ref: SepReformer_Large_DM_WHAM/modules/module.py:181-184)
    per_stage_spk_split: bool = False
    # numerics
    norm_eps: float = 1.0e-5      # LayerNorm/BatchNorm eps (torch default)
    group_norm_eps: float = 1.0e-8  # GroupNorm eps (module.py:29,124)
    # global-attention implementation: "auto" (Pallas flash kernel on TPU
    # for deterministic passes, XLA elsewhere), "xla", "pallas",
    # "pallas_interpret" (testing), "single"/"single_interpret" (the
    # single-block train kernel's forward at dropout 0 serving eval at
    # lengths <= 512 — keeps the pe bias in VMEM so the [L, d, L] pos_kt
    # relayout copies never materialize; measured SLOWER than XLA at the
    # B=4 knee, PERF_CLOSE.json), or "fused_pv"/"fused_pv_interpret"
    # (XLA scores + Pallas masked-softmax·V, ops/pallas/softmax_pv —
    # the probs tensor and its layout copies never materialize; "auto"
    # adopts it per MEASURE_ATTENTION_PV.json)
    attention_impl: str = "auto"
    # TRAIN-time global-attention implementation: "auto" (Pallas train
    # kernel — fused fwd with hash attention-prob dropout + handwritten
    # bwd — on TPU at bottleneck lengths <= 512; XLA elsewhere), "xla",
    # "pallas", "pallas_interpret".  The XLA train path materializes
    # [B, H, L, L] tensors through fwd+bwd (~22% of the Base train step
    # on v5e).
    attention_train_impl: str = "auto"
    # fused Pallas GCFN feed-forward: "auto" (on TPU, deterministic
    # passes), "on", "off", "interpret" (testing).  The 6F-wide FFN
    # intermediates are the model's main HBM-bandwidth cost; the fused
    # kernel keeps them in VMEM.
    fused_ffn: str = "auto"
    # fused Pallas CLA local block (ops/pallas/cla): "auto" currently
    # resolves to OFF — measured slower than XLA on v5e (27.96 vs
    # 23.85 ms full-model: the in-kernel k65 tap-loop conv is VPU-bound
    # while XLA's depthwise lowering uses the MXU; see CLA in blocks.py)
    # — "on"/"interpret" force it.  Eval semantics only (folded
    # running-stats BatchNorm); training keeps the XLA path.
    fused_local: str = "auto"
    # Pallas large-kernel depthwise backward (ops/pallas/depthwise,
    # CLA's k65 conv): "auto" = on for TPU, "off" = XLA grouped conv.
    # Forced off when the model mesh axis is active (Engine) — pallas_call
    # operands have no partitioning rule under a model-sharded pjit.
    fused_depthwise: str = "auto"
    # fused EGA-tail+GCFN pair kernel in GlobalBlock (ops/pallas/ega_gcfn):
    # "auto" currently resolves to OFF — measured slower than XLA's own
    # tail fusion on v5e (see GlobalBlock) — "on"/"interpret" force it
    fused_pair: str = "auto"
    # activation dtype policy: "float32" or "bfloat16".  Params stay f32;
    # norms compute statistics in f32 and cast back; softmax in f32; the
    # waveform outputs are cast back to f32 before losses/metrics.
    compute_dtype: str = "float32"
    # storage dtype of the materialized rel-pos bias path (the gathered
    # [L, d, L] pos table and the [B, H, L, L] bias product): "auto"
    # resolves to f32 — bf16 storage measured 5 ms/step SLOWER on v5e
    # (layout-pathological softmax fusions; see relpos_store_dtype) —
    # "bfloat16" forces it for re-testing.
    relpos_dtype: str = "auto"
    # wrap the materialized pos_kt in lax.optimization_barrier so XLA
    # cannot re-fuse the gather+transpose into each of the 22 consuming
    # bias dots (profiling showed a ~190 us relayout copy per consumer on
    # v5e).  "auto" resolves per measurement below; "on"/"off" force it.
    relpos_barrier: str = "auto"
    # how the shared [L, d, L] pos_kt is materialized for the XLA
    # attention path: "pallas" (layout-pinned Pallas generator,
    # ops/pallas/relpos — targets the per-consumer relayout copies that
    # were ~16% of the B=4 forward on v5e), "gather" (XLA gather, the
    # old path), "pallas_interpret" (testing).  "auto" resolves per
    # MEASURE_RELPOS.json (measure_relpos.py).
    relpos_materializer: str = "auto"
    # storage dtype of the materialized scores tensor on the "fused_pv"
    # attention path: "bfloat16" halves the scores write+read HBM
    # traffic (the path's dominant cost; the Pallas kernel upcasts and
    # runs the softmax in f32, so XLA's bf16-softmax layout pathology —
    # see relpos_store_dtype — cannot occur).  "auto" resolves per
    # MEASURE_ATTENTION_PV.json; "float32" forces full precision.
    scores_dtype: str = "auto"

    @property
    def head_dim(self) -> int:
        return self.feat_dim // self.num_heads

    def frames_for_samples(self, num_samples: int) -> int:
        """Encoder output length for a waveform of ``num_samples``."""
        return (num_samples - self.enc_kernel) // self.enc_stride + 1

    def padded_frames(self, num_frames: int) -> int:
        """Separator zero-pads frames to a multiple of 2**num_stages.

        Matches ``Separator.pad_signal`` (module.py:220-234): when already
        divisible no pad is added.
        """
        mult = 2 ** self.num_stages
        return num_frames if num_frames % mult == 0 else (num_frames // mult + 1) * mult


@dataclass(frozen=True)
class StftLossConfig:
    """STFT settings for the per-stage magnitude losses.

    (ref: configs.yaml:98-100 — hann, 512/128.)
    """

    frame_length: int = 512
    frame_shift: int = 128
    window: str = "hann"


@dataclass(frozen=True)
class CriterionConfig:
    stft: StftLossConfig = field(default_factory=StftLossConfig)
    scale_inv: bool = True
    mel_opt: bool = False
    # progressive multi-loss weighting (ref: engine.py:72)
    alpha: float = 0.4
    alpha_decay_start_epoch: int = 100
    alpha_decay_factor: float = 0.8
    alpha_decay_every: int = 5


@dataclass(frozen=True)
class OptimConfig:
    """AdamW + warmup + ReduceLROnPlateau (ref: configs.yaml:112-128)."""

    lr: float = 1.0e-3            # Base 1e-3 / Large 2e-4
    weight_decay: float = 1.0e-2
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1.0e-8
    clip_norm: float = 5.0        # engine.clip_norm (configs.yaml:137)
    warmup_steps: int = 1000      # WarmupConstantSchedule (configs.yaml:128)
    plateau_factor: float = 0.8
    plateau_patience: int = 2     # 3 for WHAM (its configs.yaml:118)
    plateau_min_lr: float = 1.0e-10
    # gradient accumulation: the train step splits the batch into this many
    # sequential micro-batches (lax.scan) and applies one update on the
    # mean gradient — large effective batches within one chip's HBM.
    # BN running stats update per micro-batch; clip/AdamW see the mean
    # gradient, matching a single big-batch step.  (Not in the reference.)
    accum_steps: int = 1
    # run clip/AdamW/decay + the param update on ONE raveled vector
    # instead of ~1300 per-leaf ops (identical math; see
    # engine.train.flatten_transformation).  MEASURED NEUTRAL on v5e
    # (MEASURE_TRAIN_LEVERS.json: +0.4 ms of 167 — the ravel/unravel
    # copies cost what the per-leaf op overhead did), so the default
    # stays off.  Changes the opt_state checkpoint tree: resumes of runs
    # saved with per-leaf state must set this false.  Forced off under
    # model parallelism (the mu/nu sharding rules match per-leaf paths).
    flat_opt_state: bool = False


@dataclass(frozen=True)
class DatasetConfig:
    """Data pipeline settings (ref: configs.yaml:5-22)."""

    max_len: int = 32000          # 4 s crop at 8 kHz
    sampling_rate: int = 8000
    scp_dir: str = "data/scp_ss_8k"
    train_mixture: str = "tr_mix.scp"
    train_sources: Tuple[str, ...] = ("tr_s1.scp", "tr_s2.scp")
    valid_mixture: str = "cv_mix.scp"
    valid_sources: Tuple[str, ...] = ("cv_s1.scp", "cv_s2.scp")
    test_mixture: str = "tt_mix.scp"
    test_sources: Tuple[str, ...] = ("tt_s1.scp", "tt_s2.scp")
    dynamic_mixing: bool = False
    # dynamic-mixing flavor: "wsj0" | "wsj0_base" | "wham" | "whamr"
    # (ref §2.7: per-variant _dynamic_mixing implementations; wsj0_base is
    # the Base variant's ±2.5 dB no-RMS-norm recipe, dead config upstream)
    dm_flavor: str = "wsj0"
    train_noise: Optional[str] = None       # WHAM/WHAMR: "tr_n.scp"
    # WHAMR: reverberant source scps used to build the mixture while the
    # anechoic scps remain the targets
    train_reverb_sources: Tuple[str, ...] = ()
    batch_size: int = 2
    num_workers: int = 8
    # eval throughput: batch test utterances (length-sorted, bucket-padded;
    # metrics still run per-utterance at true length).  1 == reference
    # behavior (dataset.py:30 forces test batch to 1)
    eval_batch_size: int = 1


@dataclass(frozen=True)
class EngineConfig:
    """Run-loop settings (ref: configs.yaml:133-139)."""

    max_epoch: int = 200
    start_scheduling: int = 50    # plateau LR active for epoch > this
    test_epochs: Tuple[int, ...] = (100, 120, 150, 170)
    mvn: bool = False
    dummy_len: int = 16000        # startup params/FLOPs summary input length
    # reference quirk emulation: engine.py:194 resets its best-valid-loss
    # tracker at the TOP of every epoch, so "save per best" saves any epoch
    # beating the session-initial validation loss.  False (default) =
    # proper best tracking across the run
    strict_reference_best: bool = False
    # log a running-mean loss line every N train steps (0 = per-epoch
    # only); the reference shows this in a tqdm postfix (engine.py:78-80)
    log_every_steps: int = 0
    # also checkpoint every Nth epoch regardless of valid loss (0 = off);
    # the reference ships an unused save_checkpoint_per_nth
    # (util_engine.py:49-78) — here it is a crash-safety net
    save_every_n_epochs: int = 0
    # group K optimizer steps into one device dispatch (lax.scan).  Wins
    # when per-dispatch latency rivals device compute (remote-dispatch
    # tunnels); 1 = one dispatch per step.  Single-process only.
    steps_per_dispatch: int = 1


@dataclass(frozen=True)
class ShardingConfig:
    """Device-mesh layout. data axis shards the utterance batch; the model
    axis (Large variants) shards attention heads + FFN hidden dims."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel_size: int = 1


@dataclass(frozen=True)
class VariantConfig:
    name: str
    model: ModelConfig = field(default_factory=ModelConfig)
    criterion: CriterionConfig = field(default_factory=CriterionConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)
    sharding: ShardingConfig = field(default_factory=ShardingConfig)
    # compute dtype policy: params always f32; activations bf16 when set
    bf16_compute: bool = False

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def _base() -> VariantConfig:
    """SepReformer_Base_WSJ0 (ref: models/SepReformer_Base_WSJ0/configs.yaml)."""
    return VariantConfig(name="SepReformer_Base_WSJ0")


def _large(name: str, **data_kw) -> VariantConfig:
    """Large-DM family: F=256, dropout 0.1, lr 2e-4, dynamic mixing on
    (ref: SepReformer_Large_DM_WSJ0/configs.yaml:37,54,109,10)."""
    cfg = VariantConfig(
        name=name,
        model=ModelConfig(feat_dim=256, dropout=0.1),
        optim=OptimConfig(lr=2.0e-4),
        dataset=DatasetConfig(dynamic_mixing=True, **data_kw),
        sharding=ShardingConfig(model_parallel_size=1),
    )
    return cfg


_PRESETS: Dict[str, Any] = {}


def _register_presets() -> None:
    _PRESETS["SepReformer_Base_WSJ0"] = _base
    _PRESETS["SepReformer_Large_DM_WSJ0"] = lambda: _large(
        "SepReformer_Large_DM_WSJ0", dm_flavor="wsj0"
    )
    _PRESETS["SepReformer_Large_DM_WHAM"] = lambda: replace(
        _large(
            "SepReformer_Large_DM_WHAM",
            dm_flavor="wham",
            train_noise="tr_n.scp",
            scp_dir="data/scp_ss_8k_wham",
        ),
        model=ModelConfig(feat_dim=256, dropout=0.1, per_stage_spk_split=True),
        optim=OptimConfig(lr=2.0e-4, plateau_patience=3),
    )
    _PRESETS["SepReformer_Large_DM_WHAMR"] = lambda: _large(
        "SepReformer_Large_DM_WHAMR",
        dm_flavor="whamr",
        train_noise="tr_n.scp",
        train_reverb_sources=("tr_s1_reverb.scp", "tr_s2_reverb.scp"),
        scp_dir="data/scp_ss_8k_whamr",
    )
    # Libri2Mix evaluation preset: the reference ships only cv/tt manifests
    # (data/scp_ss_8k_libri — mix_both, i.e. the noisy condition) and no
    # Libri2Mix configs.yaml; the result table's Libri2Mix column is the
    # WSJ0-trained Base model evaluated on these manifests.  Same model as
    # Base, scp_dir pointed at the libri manifests; train manifests for
    # training-from-scratch come from data/create_scp.py's libri2mix layout.
    _PRESETS["SepReformer_Base_Libri2Mix"] = lambda: replace(
        _base(), name="SepReformer_Base_Libri2Mix",
        dataset=DatasetConfig(scp_dir="data/scp_ss_8k_libri"),
    )
    # Paper-scale presets (sizes T/S/M are in the paper's result table but the
    # reference ships no configs for them — dims here follow the paper's
    # params/MACs scaling; approximate, documented as such).
    _PRESETS["SepReformer_T"] = lambda: replace(
        _base(), name="SepReformer_T",
        model=ModelConfig(feat_dim=64, enc_dim=256, num_stages=4),
    )
    _PRESETS["SepReformer_S"] = lambda: replace(
        _base(), name="SepReformer_S",
        model=ModelConfig(feat_dim=96, enc_dim=256, num_stages=4),
    )
    _PRESETS["SepReformer_M"] = lambda: replace(
        _base(), name="SepReformer_M",
        model=ModelConfig(feat_dim=160, enc_dim=256, num_stages=4),
    )
    _PRESETS["SepReformer_L"] = lambda: replace(
        _large("SepReformer_L"), name="SepReformer_L",
    )


_register_presets()


def available_variants() -> List[str]:
    return sorted(_PRESETS)


def get_variant(name: str) -> VariantConfig:
    """Look up a preset by name (the reference dispatches by directory name,
    ref: run.py:31-32)."""
    if name not in _PRESETS:
        raise KeyError(
            f"Unknown variant {name!r}; available: {available_variants()}"
        )
    return _PRESETS[name]()


def from_reference_yaml(path: str | pathlib.Path, name: str = "custom") -> VariantConfig:
    """Build a VariantConfig from a reference-format ``configs.yaml``.

    Schema documented at models/<VARIANT>/configs.yaml in the reference repo.
    Only the knobs our parameterized model exposes are read; clone-specific
    redundancy (e.g. per-module channel repeats tied by YAML anchors) is
    collapsed and cross-checked.
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    cfg = raw["config"]
    m = cfg["model"]
    sep = m["module_separator"]
    model = ModelConfig(
        num_stages=m["num_stages"],
        num_spks=m["num_spks"],
        enc_dim=m["module_audio_enc"]["out_channels"],
        enc_kernel=m["module_audio_enc"]["kernel_size"],
        enc_stride=m["module_audio_enc"]["stride"],
        feat_dim=m["module_feature_projector"]["out_channels"],
        num_heads=sep["relative_positional_encoding"]["num_heads"],
        pos_maxlen=sep["relative_positional_encoding"]["maxlen"],
        embed_v=sep["relative_positional_encoding"].get("embed_v", False),
        local_kernel=sep["enc_stage"]["local_blocks"]["kernel_size"],
        down_kernel=sep["enc_stage"]["down_conv_layer"]["samp_kernel_size"],
        dropout=sep["enc_stage"]["global_blocks"]["dropout_rate"],
    )
    crit = cfg.get("criterion", {})
    mag = crit.get("PIT_SISNR_mag", {})
    criterion = CriterionConfig(
        stft=StftLossConfig(
            frame_length=mag.get("frame_length", 512),
            frame_shift=mag.get("frame_shift", 128),
            window=mag.get("window", "hann"),
        ),
        scale_inv=mag.get("scale_inv", True),
        mel_opt=mag.get("mel_opt", False),
    )
    opt = cfg.get("optimizer", {}).get("AdamW", {})
    sched = cfg.get("scheduler", {})
    optim = OptimConfig(
        lr=float(opt.get("lr", 1e-3)),
        weight_decay=float(opt.get("weight_decay", 1e-2)),
        clip_norm=float(cfg.get("engine", {}).get("clip_norm", 5)),
        warmup_steps=int(
            sched.get("WarmupConstantSchedule", {}).get("warmup_steps", 1000)
        ),
        plateau_factor=float(sched.get("ReduceLROnPlateau", {}).get("factor", 0.8)),
        plateau_patience=int(sched.get("ReduceLROnPlateau", {}).get("patience", 2)),
        plateau_min_lr=float(sched.get("ReduceLROnPlateau", {}).get("min_lr", 1e-10)),
    )
    ds = cfg.get("dataset", {})
    train = ds.get("train", {})
    dataset = DatasetConfig(
        max_len=ds.get("max_len", 32000),
        sampling_rate=ds.get("sampling_rate", 8000),
        scp_dir=ds.get("scp_dir", "data/scp_ss_8k"),
        dynamic_mixing=train.get("dynamic_mixing", False),
        batch_size=cfg.get("dataloader", {}).get("batch_size", 2),
    )
    eng = cfg.get("engine", {})
    engine = EngineConfig(
        max_epoch=eng.get("max_epoch", 200),
        start_scheduling=eng.get("start_scheduling", 50),
        test_epochs=tuple(eng.get("test_epochs", (100, 120, 150, 170))),
        mvn=eng.get("mvn", False),
        dummy_len=cfg.get("check_computations", {}).get("dummy_len", 16000),
    )
    return VariantConfig(
        name=name, model=model, criterion=criterion, optim=optim,
        dataset=dataset, engine=engine,
    )


def _coerce(raw: str, current: Any) -> Any:
    """Coerce a CLI string to the type of the field's current value."""
    if isinstance(current, bool):
        if raw.lower() in ("true", "1", "yes", "on"):
            return True
        if raw.lower() in ("false", "0", "no", "off"):
            return False
        raise ValueError(f"expected bool, got {raw!r}")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(raw)
    if isinstance(current, float):
        return float(raw)
    if isinstance(current, tuple):
        elems = [e for e in raw.split(",") if e != ""]
        elem_type = type(current[0]) if current else str
        return tuple(elem_type(e) for e in elems)
    if isinstance(current, str) or current is None:
        return raw
    raise ValueError(f"cannot coerce {raw!r} to {type(current).__name__}")


def apply_override(cfg: VariantConfig, dotted: str, raw: str) -> VariantConfig:
    """Override one config field by dotted path, e.g.
    ``apply_override(cfg, "optim.warmup_steps", "100")``.

    The reference has no CLI-over-YAML override mechanism (SURVEY.md §5) —
    every experiment edits configs.yaml in place.  This powers the CLI's
    ``--set section.key=value`` flags; values are coerced to the type of
    the existing field, unknown paths are errors.
    """
    keys = dotted.split(".")

    def rec(obj: Any, path: Sequence[str]) -> Any:
        k = path[0]
        if not dataclasses.is_dataclass(obj) or k not in {
            f.name for f in dataclasses.fields(obj)
        }:
            raise KeyError(
                f"no config field {dotted!r} (failed at {k!r} on "
                f"{type(obj).__name__})"
            )
        cur = getattr(obj, k)
        if len(path) == 1:
            if dataclasses.is_dataclass(cur):
                raise KeyError(f"{dotted!r} is a section, not a field")
            return replace(obj, **{k: _coerce(raw, cur)})
        return replace(obj, **{k: rec(cur, path[1:])})

    return rec(cfg, keys)
