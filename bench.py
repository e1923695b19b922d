"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric: inference throughput in audio-seconds processed per second
per chip on SepReformer-B (the reference publishes no throughput numbers —
BASELINE.md — so ``vs_baseline`` is the real-time factor: value / 1x
real-time playback).

Runs on whatever accelerator the default environment exposes (the real TPU
chip under the driver).  Extra metrics (train step throughput, compile
times) go into the same JSON object.
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax

    # persist compiled executables across bench runs: the full train-step
    # compile takes minutes over the axon tunnel, the cache makes reruns
    # seconds
    import os

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.engine.train import create_train_state, make_train_step
    from sepreformer_tpu.models import SepReformer

    platform = jax.default_backend()
    variant = get_variant("SepReformer_Base_WSJ0")
    cfg = variant.model
    sr = variant.dataset.sampling_rate

    batch, t_samples = 4, 32000  # 4 x 4 s = 16 audio-seconds per step
    audio_seconds = batch * t_samples / sr

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=0.05, size=(batch, t_samples)), jnp.float32)

    model = SepReformer(cfg)
    t0 = time.perf_counter()
    variables = jax.jit(model.init)(jax.random.key(0), x[:1])
    jax.block_until_ready(variables)
    init_time = time.perf_counter() - t0

    @jax.jit
    def forward(variables, x):
        audio, _ = model.apply(variables, x)
        return audio

    t0 = time.perf_counter()
    out = forward(variables, x)
    jax.block_until_ready(out)
    compile_time = time.perf_counter() - t0

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(variables, x)
    jax.block_until_ready(out)
    infer_step = (time.perf_counter() - t0) / n_iters
    infer_throughput = audio_seconds / infer_step

    # train step throughput
    state = create_train_state(variant, jax.random.key(0), sample_len=t_samples)
    train_step = make_train_step(variant, donate=False)
    src = jnp.stack([x * 0.5, x * 0.5])
    lr, alpha = jnp.float32(1e-3), jnp.float32(0.4)
    key = jax.random.key(1)
    t0 = time.perf_counter()
    state2, metrics = train_step(state, x, src, lr, alpha, key)
    jax.block_until_ready(state2.params)
    train_compile_time = time.perf_counter() - t0
    n_train = 5
    t0 = time.perf_counter()
    for _ in range(n_train):
        state2, metrics = train_step(state2, x, src, lr, alpha, key)
    jax.block_until_ready(state2.params)
    train_step_time = (time.perf_counter() - t0) / n_train
    train_throughput = audio_seconds / train_step_time

    result = {
        "metric": "infer_audio_seconds_per_second_per_chip",
        "value": round(infer_throughput, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(infer_throughput, 2),  # baseline = 1x real-time
        "extras": {
            "platform": platform,
            "model": "SepReformer_Base_WSJ0",
            "batch": batch,
            "segment_seconds": t_samples / sr,
            "infer_step_ms": round(infer_step * 1e3, 2),
            "train_audio_seconds_per_second_per_chip": round(train_throughput, 2),
            "train_step_ms": round(train_step_time * 1e3, 2),
            "init_s": round(init_time, 2),
            "infer_compile_s": round(compile_time, 2),
            "train_compile_s": round(train_compile_time, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
