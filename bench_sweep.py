"""Batch-size sweep for inference and training throughput on one chip.

Round-1 verdict: the single-point bench (B=4) left the throughput knee
unmeasured.  This sweeps B in {4, 8, 16, 32} (4 s segments) for both the
inference forward and the full train step, using the same chained
fori_loop method as bench.py (dispatch-latency-proof on the axon tunnel),
and prints one JSON line with the whole curve plus the argmax operating
point.  Results are committed as BENCH_SWEEP.json and the knee becomes
bench.py's default operating point.

Optionally sweeps compute dtype (--dtypes f32,bf16) to quantify the bf16
inference regression reported in round 1 (STATUS.md "Session 2").
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="4,8,16,32")
    p.add_argument("--dtypes", default="f32")
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--variant", default="SepReformer_Base_WSJ0")
    p.add_argument("--modes", default="infer,train")
    p.add_argument("--out", default="BENCH_SWEEP.json")
    args = p.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.engine.train import create_train_state, make_train_step
    from sepreformer_tpu.models import SepReformer

    batches = [int(b) for b in args.batches.split(",")]
    dtypes = args.dtypes.split(",")
    modes = args.modes.split(",")

    base_variant = get_variant(args.variant)
    sr = base_variant.dataset.sampling_rate
    t_samples = int(args.seconds * sr)
    rng = np.random.default_rng(0)

    results: dict[str, dict] = {}
    for dt in dtypes:
        variant = base_variant
        if dt == "bf16":
            variant = dataclasses.replace(
                base_variant,
                model=dataclasses.replace(base_variant.model,
                                          compute_dtype="bfloat16"),
            )
        cfg = variant.model
        model = SepReformer(cfg)
        variables = jax.jit(model.init)(
            jax.random.key(0),
            jnp.zeros((1, 16000), jnp.float32))
        state = create_train_state(variant, jax.random.key(0),
                                   sample_len=t_samples)
        train_step = make_train_step(variant, donate=False)
        lr, alpha = jnp.float32(1e-3), jnp.float32(0.4)

        for batch in batches:
            x = jnp.asarray(
                rng.normal(scale=0.05, size=(batch, t_samples)), jnp.float32)
            src = jnp.stack([x * 0.5, x * 0.5])
            audio_seconds = batch * args.seconds

            if "infer" in modes:
                n_chain = 10

                @jax.jit
                def infer_chain(variables, x):
                    def body(i, x):
                        audio, _ = model.apply(variables, x)
                        return x + 1e-6 * audio.sum(axis=0)
                    return jax.lax.fori_loop(0, n_chain, body, x).sum()

                t0 = time.perf_counter()
                float(infer_chain(variables, x))
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(infer_chain(variables, x))
                step = (time.perf_counter() - t0) / n_chain
                results[f"infer_{dt}_b{batch}"] = {
                    "step_ms": round(step * 1e3, 2),
                    "audio_s_per_s": round(audio_seconds / step, 1),
                    "compile_s": round(compile_s, 1),
                }
                print(json.dumps({f"infer_{dt}_b{batch}":
                                  results[f"infer_{dt}_b{batch}"]}),
                      flush=True)

            if "train" in modes:
                n_chain = 4

                @jax.jit
                def train_chain(state, x, src):
                    def body(i, state):
                        new_state, _ = train_step(
                            state, x, src, lr, alpha,
                            jax.random.fold_in(jax.random.key(1), i))
                        return new_state
                    final = jax.lax.fori_loop(0, n_chain, body, state)
                    return jax.tree.leaves(final.params)[0].sum()

                t0 = time.perf_counter()
                float(train_chain(state, x, src))
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(train_chain(state, x, src))
                step = (time.perf_counter() - t0) / n_chain
                results[f"train_{dt}_b{batch}"] = {
                    "step_ms": round(step * 1e3, 2),
                    "audio_s_per_s": round(audio_seconds / step, 1),
                    "compile_s": round(compile_s, 1),
                }
                print(json.dumps({f"train_{dt}_b{batch}":
                                  results[f"train_{dt}_b{batch}"]}),
                      flush=True)

    best_infer = max(
        (k for k in results if k.startswith("infer")),
        key=lambda k: results[k]["audio_s_per_s"], default=None)
    best_train = max(
        (k for k in results if k.startswith("train")),
        key=lambda k: results[k]["audio_s_per_s"], default=None)
    summary = {
        "metric": "batch_sweep_best_infer_audio_s_per_s",
        "value": results[best_infer]["audio_s_per_s"] if best_infer else 0,
        "unit": "audio-s/s/chip",
        "vs_baseline": results[best_infer]["audio_s_per_s"] if best_infer else 0,
        "extras": {
            "platform": jax.default_backend(),
            "segment_seconds": args.seconds,
            "best_infer": best_infer,
            "best_train": best_train,
            "curve": results,
        },
    }
    print(json.dumps(summary))
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
