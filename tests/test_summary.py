"""Model summary (params/MACs) tests."""

import numpy as np

from sepreformer_tpu.config import get_variant
from sepreformer_tpu.utils.summary import model_summary

from test_model import tiny_cfg


def test_summary_tiny():
    import dataclasses

    from sepreformer_tpu.config import VariantConfig

    cfg = VariantConfig(name="tiny", model=tiny_cfg())
    out = model_summary(cfg, input_len=800)
    assert out["params"] > 0
    # XLA cost analysis should be available on CPU
    if "gmacs_per_audio_second" in out:
        assert out["gmacs_per_audio_second"] > 0


def test_base_macs_match_paper_scale():
    """SepReformer-B is 39.8 GMac/s in the paper's table (BASELINE.md).

    XLA's flop count for our implementation should land in the right
    ballpark (flops accounting differs from ptflops conventions, so a wide
    band)."""
    cfg = get_variant("SepReformer_Base_WSJ0")
    out = model_summary(cfg, input_len=16000)
    assert 13.5 < out["params_m"] < 15.0
    if "gmacs_per_audio_second" in out:
        assert 15.0 < out["gmacs_per_audio_second"] < 90.0
