"""On-chip A/B: pos_kt materializer — XLA gather vs layout-pinned Pallas.

The gather's d-minor [L, L, d] layout makes XLA's layout assignment
re-copy the shared pos_kt per consuming bias dot (~16% of the B=4
forward, ARCHITECTURE.md); the Pallas generator (ops/pallas/relpos.py)
pins the dot-operand layout at the custom-call boundary.  Measures the
full-model Base forward with each materializer (chained fori_loop,
bench.py method) plus a numeric cross-check.  Writes MEASURE_RELPOS.json;
resolve_relpos_materializer's "auto" should follow the winner.
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
    for mat in ("gather", "pallas"):
        variant = get_variant("SepReformer_Base_WSJ0")
        variant = dataclasses.replace(
            variant,
            model=dataclasses.replace(variant.model,
                                      relpos_materializer=mat),
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
        outs[mat] = np.asarray(audio)
        results[f"model_{mat}"] = {"step_ms": round(step_ms, 2),
                                   "compile_s": round(compile_s, 1)}
        print(json.dumps({f"model_{mat}": results[f"model_{mat}"]}),
              flush=True)

    denom = np.maximum(np.abs(outs["gather"]).max(), 1e-6)
    results["max_abs_diff_vs_gather_rel_to_peak"] = float(
        np.max(np.abs(outs["pallas"] - outs["gather"])) / denom)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "MEASURE_RELPOS.json")
    with open(path, "w") as fjson:
        json.dump(results, fjson, indent=1)
    print(json.dumps({"metric": "relpos_materializer", "results": results}))


if __name__ == "__main__":
    main()
