"""Launcher for the flagship SepReformer-B synthetic-corpus training run.

Identical pipeline/settings to the round-1 SepReformer-T run
(models/SepReformer_T_synth: batch 8 x 4 s, default warmup+plateau LR,
steps_per_dispatch=8) so the quality numbers are directly comparable;
only the model preset changes (T feat_dim 64 -> Base feat_dim 128,
14.7M params — the reference's headline config,
ref: models/SepReformer_Base_WSJ0/configs.yaml).

Registers SIGUSR1 with faulthandler so stacks can be dumped without
killing the run (default SIGUSR1 disposition terminates the process).
"""

import faulthandler
import signal
import sys

faulthandler.register(signal.SIGUSR1)

from sepreformer_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main([
        "--model", "SepReformer_Base_WSJ0",
        "--engine-mode", "train",
        "--scp-dir", "data_synth/scp",
        # measured train operating point (PERF_CLOSE.json r3): B=4 is the
        # per-chip throughput knee (150.6 ms, 106.2 audio-s/s) vs B=8
        # (314.7 ms, 101.7) — batch 8 is kept anyway for convergence
        # comparability with the round-1 T run (same optimizer schedule
        # per-step); the 4% throughput delta is noise against
        # epoch-count effects
        "--batch-size", "8",
        # Engine.run iterates range(start, max_epoch) exclusive (matching
        # the reference loop); 121 runs epochs 1..120 incl. the inline
        # test at the default test_epochs 100 and 120.
        "--max-epoch", "121",
        "--workdir", "models/SepReformer_B_synth",
        "--set", "engine.steps_per_dispatch=8",
        # the reference steps warmup per-iteration during epoch 1 ONLY
        # (engine.py:61); with 150 steps/epoch the default 1000-step
        # warmup would freeze the LR at 0.15e-3 — scale it to one epoch
        # so the run reaches the full 1e-3 (same setting as the round-1
        # SepReformer-T run)
        "--set", "optim.warmup_steps=150",
        # extra flags (e.g. --set engine.test_epochs=...) pass through
        *sys.argv[1:],
    ]))
