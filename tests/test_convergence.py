"""End-to-end learning check: a tiny model overfits one synthetic mixture.

The reference's only correctness evidence for training is the loss curve
figure (data/figure/Training_Curve.png); this is the automated equivalent —
uPIT SI-SNR loss must drop substantially and SI-SNRi must turn positive
when overfitting a single fixed 2-speaker mixture.
"""

import numpy as np

import jax
import jax.numpy as jnp

from sepreformer_tpu.config import (
    ModelConfig,
    OptimConfig,
    VariantConfig,
)
from sepreformer_tpu.engine.train import create_train_state, make_train_step
from sepreformer_tpu.metrics import pit_sisnri_np


def test_train_step_overfits_single_mixture():
    cfg = VariantConfig(
        name="tiny-overfit",
        model=ModelConfig(
            num_stages=1, num_spks=2, enc_dim=16, enc_kernel=16, enc_stride=4,
            feat_dim=16, num_heads=2, pos_maxlen=64, local_kernel=9,
            down_kernel=5, dropout=0.0,
        ),
        optim=OptimConfig(lr=3e-3, warmup_steps=5),
    )
    t = 2000
    rng = np.random.default_rng(0)
    # two easily separable narrowband sources
    tt = np.arange(t) / 8000.0
    s1 = (np.sin(2 * np.pi * 400 * tt) * 0.3).astype(np.float32)
    s2 = (np.sign(np.sin(2 * np.pi * 97 * tt)) * 0.2).astype(np.float32)
    src = jnp.asarray(np.stack([s1, s2])[:, None])      # [2, 1, T]
    mix = jnp.asarray((s1 + s2)[None])                   # [1, T]

    state = create_train_state(cfg, jax.random.key(0), sample_len=t)
    step = jax.jit(make_train_step(cfg, donate=False))

    losses = []
    key = jax.random.key(1)
    for i in range(80):
        key, sub = jax.random.split(key)
        state, metrics = step(state, mix, src, jnp.float32(3e-3),
                              jnp.float32(0.4), sub)
        losses.append(float(metrics["time_loss"]) / 2)

    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first - 8.0, f"no learning: {first:.2f} -> {last:.2f}"

    # Separation quality on the training mixture must be deep, not merely
    # positive: this seeded setup reaches ~19.5 dB SI-SNRi at step 80
    # (trajectory: 18.97 dB @40, 19.55 @80, 21.2 @120 — measured on CPU),
    # so a 10 dB floor catches subtle training-math regressions (wrong
    # loss scaling, grad clipping, optimizer wiring) that a "> 3 dB"
    # canary would miss, with ~9.5 dB of seed margin.
    from sepreformer_tpu.engine.train import make_forward_fn

    fwd = make_forward_fn(cfg)
    est = np.asarray(fwd(state.params, state.batch_stats, mix))[:, 0]
    sisnri, _ = pit_sisnri_np(est, np.stack([s1, s2]), np.asarray(mix[0]))
    assert sisnri > 10.0, f"SI-SNRi {sisnri:.2f} dB after overfitting"
