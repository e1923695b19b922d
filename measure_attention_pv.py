"""On-chip A/B: fused softmax·V eval attention (ops/pallas/softmax_pv).

Measures the full-model Base forward with attention_impl="fused_pv"
(XLA scores + Pallas masked-softmax·V) against the all-XLA path, both
on the layout-pinned Pallas pos_kt (MEASURE_RELPOS.json baseline).
Chained fori_loop, bench.py method.  Writes MEASURE_ATTENTION_PV.json.
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

    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.models import SepReformer

    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.normal(scale=0.05, size=(4, 32000)), jnp.float32)

    results: dict[str, dict] = {}
    outs = {}
    for name, impl, mat, sdt in (
        ("xla_pallasmat", "xla", "pallas", "float32"),
        ("fused_pv_pallasmat", "fused_pv", "pallas", "float32"),
        ("fused_pv_bf16scores", "fused_pv", "pallas", "bfloat16"),
    ):
        variant = get_variant("SepReformer_Base_WSJ0")
        variant = dataclasses.replace(
            variant,
            model=dataclasses.replace(
                variant.model,
                attention_impl=impl,
                relpos_materializer=mat,
                scores_dtype=sdt,
            ),
        )
        model = SepReformer(variant.model)
        variables = jax.jit(model.init)(jax.random.key(0), xw[:1, :16000])

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
        audio, _ = jax.jit(lambda v, x: model.apply(v, x))(variables, xw)
        outs[name] = np.asarray(audio)
        results[name] = {"step_ms": round(step_ms, 2),
                         "compile_s": round(compile_s, 1)}
        print(json.dumps({name: results[name]}), flush=True)

    base = outs["xla_pallasmat"]
    for name in ("fused_pv_pallasmat", "fused_pv_bf16scores"):
        results[f"max_abs_diff_{name}_rel_to_peak"] = float(
            np.max(np.abs(outs[name] - base))
            / max(np.abs(base).max(), 1e-6))

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "MEASURE_ATTENTION_PV.json")
    with open(path, "w") as fjson:
        json.dump(results, fjson, indent=1)
    print(json.dumps({"metric": "attention_pv", "results": results}))


if __name__ == "__main__":
    main()
