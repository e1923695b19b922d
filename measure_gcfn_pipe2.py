"""Focused A/B: full Base forward with pipelined vs single-shot fused
GCFN, alternating legs to average out background contention (a training
client may be running on the shared chip).  Appends to
MEASURE_GCFN_PIPE.json under "model_ab".
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

    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.models import SepReformer
    import sepreformer_tpu.ops.pallas.gcfn as gcfn_mod

    rng = np.random.default_rng(0)
    variant = get_variant("SepReformer_Base_WSJ0")
    model = SepReformer(variant.model)
    xw = jnp.asarray(rng.normal(scale=0.05, size=(4, 32000)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), xw[:1, :16000])
    orig_chunks = gcfn_mod.pipe_chunks

    chains = {}
    for pipe in ("off", "auto"):
        gcfn_mod.pipe_chunks = (
            (lambda bt: None) if pipe == "off" else orig_chunks)
        jax.clear_caches()

        @jax.jit
        def fchain(variables, xw):
            def body(i, xw):
                audio, _ = model.apply(variables, xw)
                return xw + 1e-6 * audio.sum(axis=0)
            return jax.lax.fori_loop(0, 20, body, xw).sum()

        float(fchain(variables, xw))  # compile + warm
        chains[pipe] = fchain
    gcfn_mod.pipe_chunks = orig_chunks

    times: dict[str, list] = {"off": [], "auto": []}
    for rep in range(4):
        for pipe in ("off", "auto"):
            t0 = time.perf_counter()
            float(chains[pipe](variables, xw))
            times[pipe].append((time.perf_counter() - t0) / 20 * 1e3)
    summary = {
        pipe: {"step_ms_min": round(min(v), 2),
               "step_ms_all": [round(x, 2) for x in v]}
        for pipe, v in times.items()
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "MEASURE_GCFN_PIPE.json")
    data = {}
    if os.path.exists(path):
        with open(path) as fjson:
            data = json.load(fjson)
    data["model_ab"] = summary
    with open(path, "w") as fjson:
        json.dump(data, fjson, indent=1)
    print(json.dumps({"model_ab": summary}))


if __name__ == "__main__":
    main()
