"""Focused A/B: full Base forward with pipelined vs single-shot fused
GCFN.  Each leg is compiled AND measured within its own iteration — the
earlier alternating version cleared the first leg's jit cache when
compiling the second, so the first leg silently re-traced under the
restored (auto) patch at measurement time and both legs measured the
same program.  Requires a quiet chip.  Also covers the widened
MAX_BLOCK_PIPE=2000 blocks (bt=2000, nt=4 at full resolution).

Appends to MEASURE_GCFN_PIPE.json under "model_ab".
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

    summary = {}
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

        t0 = time.perf_counter()
        float(fchain(variables, xw))
        compile_s = round(time.perf_counter() - t0, 1)
        reps = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(fchain(variables, xw))
            reps.append((time.perf_counter() - t0) / 20 * 1e3)
        summary[pipe] = {"step_ms_min": round(min(reps), 2),
                         "step_ms_all": [round(a, 2) for a in reps],
                         "compile_s": compile_s}
        print(json.dumps({pipe: summary[pipe]}), flush=True)
    gcfn_mod.pipe_chunks = orig_chunks

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
