"""Launchers for the round-2 follow-up on-chip training runs.

Usage: python train_synth_extra.py {large|wham|whamr}

- large: SepReformer_Large_DM_WSJ0 (feat_dim 256, dynamic mixing) on the
  clean synthetic corpus — proves the wide variant trains stably
  end-to-end through the stock CLI/Engine (round-1 verdict item 1).
- wham / whamr: the noisy / noisy+reverberant presets on the matching
  synthetic corpora (data/synth.py --flavor ...) — proves the WHAM/WHAMR
  dynamic-mixing paths end-to-end on the chip (verdict item 6).

Each run is short (the point is stable end-to-end learning, not a
converged benchmark); an inline test epoch reports SI-SNRi.
"""

import faulthandler
import signal
import sys

faulthandler.register(signal.SIGUSR1)

from sepreformer_tpu.cli import main

RUNS = {
    "large": [
        "--model", "SepReformer_Large_DM_WSJ0",
        "--scp-dir", "data_synth/scp",
        # Large at 4 s segments was measured at batch 2 on one v5e chip
        # (STATUS.md) — stay at the measured point; batch 4 is untested
        # for HBM fit and an OOM after the long compile would waste the
        # run.  Warmup scaled to one epoch as in the B/T runs.
        "--batch-size", "2",
        "--max-epoch", "13",
        "--workdir", "models/SepReformer_L_synth",
        "--set", "optim.warmup_steps=600",
        "--set", "engine.test_epochs=6,12",
        "--set", "engine.steps_per_dispatch=8",
    ],
    "wham": [
        "--model", "SepReformer_Large_DM_WHAM",
        "--scp-dir", "data_synth_wham/scp",
        "--batch-size", "2",
        "--max-epoch", "13",
        "--workdir", "models/SepReformer_WHAM_synth",
        "--set", "optim.warmup_steps=600",
        "--set", "engine.test_epochs=6,12",
        "--set", "engine.steps_per_dispatch=8",
    ],
    "whamr": [
        "--model", "SepReformer_Large_DM_WHAMR",
        "--scp-dir", "data_synth_whamr/scp",
        "--batch-size", "2",
        "--max-epoch", "13",
        "--workdir", "models/SepReformer_WHAMR_synth",
        "--set", "optim.warmup_steps=600",
        "--set", "engine.test_epochs=6,12",
        "--set", "engine.steps_per_dispatch=8",
    ],
}

if __name__ == "__main__":
    which = sys.argv[1]
    # extra flags (e.g. --set engine.test_epochs=...) pass through
    sys.exit(main(["--engine-mode", "train", *RUNS[which], *sys.argv[2:]]))
