"""Performance lab: compare compute-dtype x attention-impl variants.

Chained-loop measurement (see bench.py docstring for why).  Run on the TPU
container:  ``python perf_lab.py [--batch 4] [--seconds 4] [--train]``
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time


def measure_infer(variant, batch, t_samples, n_chain=20):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sepreformer_tpu.models import SepReformer

    model = SepReformer(variant.model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=0.05, size=(batch, t_samples)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x[:1, :16000])

    @jax.jit
    def chain(variables, x):
        def body(i, x):
            audio, _ = model.apply(variables, x)
            return x + 1e-6 * audio.sum(axis=0)
        return jax.lax.fori_loop(0, n_chain, body, x).sum()

    t0 = time.perf_counter()
    float(chain(variables, x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(variables, x))
    step = (time.perf_counter() - t0) / n_chain
    return step, compile_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--variant", default="SepReformer_Base_WSJ0")
    p.add_argument("--impls", nargs="+", default=["xla", "pallas"])
    p.add_argument("--dtypes", nargs="+", default=["float32", "bfloat16"])
    p.add_argument("--barrier", choices=["auto", "on", "off"], default="auto",
                   help="relpos_barrier setting (pos_kt optimization_barrier)")
    args = p.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sepreformer_tpu.config import get_variant

    base = get_variant(args.variant)
    sr = base.dataset.sampling_rate
    t_samples = int(args.seconds * sr)
    audio_seconds = args.batch * args.seconds

    results = {}
    for dtype in args.dtypes:
        for impl in args.impls:
            variant = dataclasses.replace(
                base,
                model=dataclasses.replace(
                    base.model, compute_dtype=dtype, attention_impl=impl,
                    relpos_barrier=args.barrier,
                ),
            )
            try:
                step, compile_s = measure_infer(variant, args.batch, t_samples)
                results[f"{dtype}/{impl}"] = {
                    "step_ms": round(step * 1e3, 2),
                    "audio_s_per_s": round(audio_seconds / step, 1),
                    "compile_s": round(compile_s, 1),
                }
            except Exception as e:
                results[f"{dtype}/{impl}"] = {"error": str(e)[:200]}
            print(f"{dtype}/{impl}: {results[f'{dtype}/{impl}']}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
