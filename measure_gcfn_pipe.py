"""On-chip A/B: software-pipelined fused GCFN vs the single-shot kernel.

The single-shot kernel runs at ~2x its compute+traffic floor because its
VPU stages (LN, dw3, GLU) serialize with the two MXU dots inside one grid
step (ARCHITECTURE.md roofline).  The pipelined variant processes each
time-block in ~128-row sub-chunks with a one-stage lookahead so chunk
j+1's up-projection dot can overlap chunk j's dw3/GLU on the VPU.

Measures the standalone kernel (chained fori_loop, bench.py method) at
the full-resolution Base shape plus the Large shape, verifies numerical
equivalence, and times the full Base forward with each kernel.

Writes MEASURE_GCFN_PIPE.json.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from sepreformer_tpu.ops.pallas.gcfn import _fused_gcfn_impl

    rng = np.random.default_rng(0)
    results: dict[str, dict] = {}
    n_chain = 50

    def make(b, t, f, hidden, dtype):
        x = jnp.asarray(rng.normal(size=(b, t, f)) * 0.1, dtype)
        params = tuple(
            jnp.asarray(a, jnp.float32) for a in (
                rng.normal(size=(f,)) * 0.1 + 1.0,
                rng.normal(size=(f,)) * 0.1,
                rng.normal(size=(f, hidden)) * 0.05,
                rng.normal(size=(hidden,)) * 0.05,
                rng.normal(size=(3, hidden)) * 0.2,
                rng.normal(size=(hidden,)) * 0.05,
                rng.normal(size=(hidden // 2, f)) * 0.05,
                rng.normal(size=(f,)) * 0.05,
                rng.normal(size=(f,)) * 1e-2,
            )
        )
        return x, params

    shapes = {
        "base_full": (4, 8000, 128, 768, jnp.float32),
        "base_mid": (4, 2000, 128, 768, jnp.float32),
        "large_full": (2, 8000, 256, 1536, jnp.bfloat16),
    }
    for name, (b, t, f, hidden, dtype) in shapes.items():
        x, params = make(b, t, f, hidden, dtype)
        outs = {}
        for pipe in ("off", "auto"):
            @jax.jit
            def chain(x, params):
                def body(i, x):
                    y = _fused_gcfn_impl(x, params, 1e-5, pipe=pipe)
                    return x + (1e-6 * y).astype(x.dtype)
                return jax.lax.fori_loop(0, n_chain, body, x).sum()

            t0 = time.perf_counter()
            float(chain(x, params))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(chain(x, params))
            per_call_us = (time.perf_counter() - t0) / n_chain * 1e6
            outs[pipe] = np.asarray(
                _fused_gcfn_impl(x, params, 1e-5, pipe=pipe), np.float32)
            results[f"{name}_{pipe}"] = {
                "per_call_us": round(per_call_us, 1),
                "compile_s": round(compile_s, 1),
            }
            print(json.dumps({f"{name}_{pipe}": results[f"{name}_{pipe}"]}),
                  flush=True)
        denom = np.maximum(np.abs(outs["off"]), 1e-6)
        results[f"{name}_max_rel_diff"] = float(
            np.max(np.abs(outs["auto"] - outs["off"]) / denom))

    # full Base forward with each kernel (fused_ffn auto on TPU)
    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.models import SepReformer
    import sepreformer_tpu.ops.pallas.gcfn as gcfn_mod

    variant = get_variant("SepReformer_Base_WSJ0")
    model = SepReformer(variant.model)
    xw = jnp.asarray(rng.normal(scale=0.05, size=(4, 32000)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), xw[:1, :16000])
    orig_chunks = gcfn_mod.pipe_chunks
    for pipe in ("off", "auto"):
        # the model path calls fused_gcfn with default pipe="auto"; patch
        # pipe_chunks to force the single-shot kernel for the "off" leg
        gcfn_mod.pipe_chunks = (
            (lambda bt: None) if pipe == "off" else orig_chunks)
        jax.clear_caches()

        @jax.jit
        def fchain(variables, xw):
            def body(i, xw):
                audio, _ = model.apply(variables, xw)
                return xw + 1e-6 * audio.sum(axis=0)
            return jax.lax.fori_loop(0, 20, body, xw).sum()

        t0 = time.perf_counter()
        float(fchain(variables, xw))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fchain(variables, xw))
        step_ms = (time.perf_counter() - t0) / 20 * 1e3
        results[f"model_{pipe}"] = {"step_ms": round(step_ms, 2),
                                    "compile_s": round(compile_s, 1)}
        print(json.dumps({f"model_{pipe}": results[f"model_{pipe}"]}),
              flush=True)
    gcfn_mod.pipe_chunks = orig_chunks

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "MEASURE_GCFN_PIPE.json")
    with open(path, "w") as fjson:
        json.dump(results, fjson, indent=1)
    print(json.dumps({"metric": "gcfn_pipe", "results": results}))


if __name__ == "__main__":
    main()
