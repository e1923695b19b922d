"""On-chip A/B: fused-GCFN in-kernel MXU operand dtype for f32 streams.

XLA's DEFAULT precision for f32 dots on v5e rounds operands to bf16 and
runs ONE MXU pass; if Mosaic instead runs the kernel's f32 dots as a
multi-pass product, the fused GCFN (26% of the forward) is leaving ~2x
MXU throughput on the table.  This measures the standalone kernel at the
full-resolution Base shape, both operand dtypes, chained fori_loop
(bench.py method), and a full-model forward with each setting.

Writes MEASURE_GCFN_MXU.json; resolve_mxu's "auto" should follow the
winner.
"""

from __future__ import annotations

import dataclasses
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
    b, t, f, hidden = 4, 8000, 128, 768
    x = jnp.asarray(rng.normal(size=(b, t, f)) * 0.1, jnp.float32)
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

    results: dict[str, dict] = {}
    n_chain = 50
    outs = {}
    for mxu in ("f32", "bf16"):
        @jax.jit
        def chain(x, params):
            def body(i, x):
                y = _fused_gcfn_impl(x, params, 1e-5, mxu=mxu)
                return x + 1e-6 * y
            return jax.lax.fori_loop(0, n_chain, body, x).sum()

        t0 = time.perf_counter()
        float(chain(x, params))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(x, params))
        per_call_us = (time.perf_counter() - t0) / n_chain * 1e6
        outs[mxu] = np.asarray(
            _fused_gcfn_impl(x, params, 1e-5, mxu=mxu))
        results[f"kernel_{mxu}"] = {
            "per_call_us": round(per_call_us, 1),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps({f"kernel_{mxu}": results[f"kernel_{mxu}"]}),
              flush=True)
    denom = np.maximum(np.abs(outs["f32"]), 1e-6)
    results["max_rel_diff_bf16_vs_f32"] = float(
        np.max(np.abs(outs["bf16"] - outs["f32"]) / denom))

    # full-model forward with each setting (fused_ffn auto on TPU)
    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.models import SepReformer
    import sepreformer_tpu.ops.pallas.gcfn as gcfn_mod

    variant = get_variant("SepReformer_Base_WSJ0")
    model = SepReformer(variant.model)
    xw = jnp.asarray(rng.normal(scale=0.05, size=(4, 32000)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), xw[:1, :16000])
    orig_resolve = gcfn_mod.resolve_mxu
    for mxu in ("f32", "bf16"):
        gcfn_mod.resolve_mxu = (
            lambda m, dt, it, _f=orig_resolve, _mx=mxu: _f(_mx, dt, it))
        # resolve_mxu is consulted at trace time under the SAME static
        # args ("auto"), so the in-memory jit cache must be dropped for
        # the patch to take effect (the persistent disk cache still hits
        # per distinct HLO)
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
        results[f"model_{mxu}"] = {"step_ms": round(step_ms, 2),
                                   "compile_s": round(compile_s, 1)}
        print(json.dumps({f"model_{mxu}": results[f"model_{mxu}"]}),
              flush=True)
    gcfn_mod.resolve_mxu = orig_resolve

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "MEASURE_GCFN_MXU.json")
    with open(path, "w") as fjson:
        json.dump(results, fjson, indent=1)
    print(json.dumps({"metric": "gcfn_mxu", "results": results}))


if __name__ == "__main__":
    main()
