"""Config system tests, including parsing the actual reference YAMLs."""

import os

import pytest

from sepreformer_tpu.config import (
    available_variants,
    from_reference_yaml,
    get_variant,
)

REFERENCE = "/root/reference/models"


def test_presets_exist():
    names = available_variants()
    for required in (
        "SepReformer_Base_WSJ0", "SepReformer_Large_DM_WSJ0",
        "SepReformer_Large_DM_WHAM", "SepReformer_Large_DM_WHAMR",
    ):
        assert required in names


def test_base_preset_values():
    cfg = get_variant("SepReformer_Base_WSJ0")
    m = cfg.model
    assert (m.feat_dim, m.enc_dim, m.num_heads, m.num_stages) == (128, 256, 8, 4)
    assert m.dropout == 0.05
    assert cfg.optim.lr == 1e-3
    assert cfg.engine.test_epochs == (100, 120, 150, 170)


def test_wham_preset_deltas():
    cfg = get_variant("SepReformer_Large_DM_WHAM")
    assert cfg.model.per_stage_spk_split
    assert cfg.optim.plateau_patience == 3
    assert cfg.dataset.train_noise == "tr_n.scp"


@pytest.mark.parametrize("variant", [
    "SepReformer_Base_WSJ0", "SepReformer_Large_DM_WSJ0",
    "SepReformer_Large_DM_WHAM", "SepReformer_Large_DM_WHAMR",
])
def test_reference_yaml_roundtrip(variant):
    """Parsing the reference's own configs.yaml must reproduce our preset's
    model/optim hyperparameters."""
    path = os.path.join(REFERENCE, variant, "configs.yaml")
    if not os.path.exists(path):
        pytest.skip("reference tree unavailable")
    parsed = from_reference_yaml(path, name=variant)
    preset = get_variant(variant)
    for field in ("num_stages", "num_spks", "enc_dim", "enc_kernel",
                  "enc_stride", "feat_dim", "num_heads", "pos_maxlen",
                  "local_kernel", "down_kernel", "dropout"):
        assert getattr(parsed.model, field) == getattr(preset.model, field), field
    assert parsed.optim.lr == preset.optim.lr
    assert parsed.optim.plateau_patience == preset.optim.plateau_patience
    assert parsed.engine.max_epoch == preset.engine.max_epoch


def test_apply_override_paths_and_coercion():
    from sepreformer_tpu.config import apply_override, get_variant

    cfg = get_variant("SepReformer_T")
    cfg = apply_override(cfg, "optim.warmup_steps", "100")
    cfg = apply_override(cfg, "dataset.train_sources", "a.scp,b.scp")
    cfg = apply_override(cfg, "engine.test_epochs", "10,20")
    cfg = apply_override(cfg, "model.dropout", "0.0")
    cfg = apply_override(cfg, "dataset.dynamic_mixing", "true")
    assert cfg.optim.warmup_steps == 100
    assert cfg.dataset.train_sources == ("a.scp", "b.scp")
    assert cfg.engine.test_epochs == (10, 20)
    assert cfg.model.dropout == 0.0
    assert cfg.dataset.dynamic_mixing is True

    import pytest

    with pytest.raises(KeyError):
        apply_override(cfg, "optim.nope", "1")
    with pytest.raises(KeyError):
        apply_override(cfg, "optim", "1")
    with pytest.raises(ValueError):
        apply_override(cfg, "dataset.dynamic_mixing", "maybe")
