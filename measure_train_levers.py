"""On-chip A/B of the round-5 train-step levers on the full Base train
step (bench.py chained method):

- gcfn pipe:   software-pipelined train GCFN fwd/bwd kernels vs the
               single-shot r4 kernels (gcfn_train.py pipe knob)
- dw bwd mode: dx as an XLA flipped-kernel depthwise conv + dw-only tap
               loop ("conv") vs the fused dx+dw tap loop ("fused")
- flat opt:    optim.flat_opt_state (one raveled optimizer pass)

Each config is compiled AND measured inside its own iteration — earlier
versions alternated legs, but `jax.clear_caches()` between configs plus
closures capturing the rebound `train_step` loop variable meant every
leg silently re-traced to the LAST config's program at measurement time
(all legs identical to 0.4% — the tell).  Requires a quiet chip.

Writes MEASURE_TRAIN_LEVERS.json.
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
    from sepreformer_tpu.engine.train import create_train_state, make_train_step
    import sepreformer_tpu.ops.pallas.gcfn as gcfn_mod
    import sepreformer_tpu.ops.pallas.gcfn_train as gt_mod
    import sepreformer_tpu.ops.pallas.depthwise as dw_mod

    rng = np.random.default_rng(0)
    variant = get_variant("SepReformer_Base_WSJ0")
    batch, t = 4, 32000
    x = jnp.asarray(rng.normal(scale=0.05, size=(batch, t)), jnp.float32)
    src = jnp.stack([x * 0.5, x * 0.5])  # [spks, B, T]
    orig_chunks = gcfn_mod.pipe_chunks

    configs = {
        "r4": (False, "fused", False),
        "pipe_only": (True, "fused", False),
        "dwconv_only": (False, "conv", False),
        "both": (True, "conv", False),
        "both_flat": (True, "conv", True),  # + optim.flat_opt_state
    }
    results = {}
    n_chain = 5
    for name, (pipe_on, dw_mode, flat) in configs.items():
        # gcfn_train binds pipe_chunks BY NAME at import — patch both
        # modules' bindings
        patched = orig_chunks if pipe_on else (lambda bt: None)
        gcfn_mod.pipe_chunks = patched
        gt_mod.pipe_chunks = patched
        dw_mod.BWD_MODE = dw_mode
        jax.clear_caches()
        v = variant
        if flat:
            v = dataclasses.replace(
                v, optim=dataclasses.replace(v.optim, flat_opt_state=True))
        st = create_train_state(v, jax.random.key(0), sample_len=t)
        train_step = make_train_step(v, donate=False)

        @jax.jit
        def chain(state, x, src, _step=train_step):
            def body(i, state):
                new_state, _ = _step(
                    state, x, src, jnp.float32(1e-4), jnp.float32(0.4),
                    jax.random.key(1))
                return new_state
            final = jax.lax.fori_loop(0, n_chain, body, state)
            return jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l.astype(jnp.float32)),
                final.params, jnp.float32(0))

        t0 = time.perf_counter()
        float(chain(st, x, src))
        compile_s = round(time.perf_counter() - t0, 1)
        reps = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(chain(st, x, src))
            reps.append((time.perf_counter() - t0) / n_chain * 1e3)
        results[name] = {
            "step_ms_min": round(min(reps), 2),
            "step_ms_all": [round(a, 2) for a in reps],
            "compile_s": compile_s,
        }
        print(json.dumps({name: results[name]}), flush=True)
    gcfn_mod.pipe_chunks = orig_chunks
    gt_mod.pipe_chunks = orig_chunks
    dw_mod.BWD_MODE = "conv"

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "MEASURE_TRAIN_LEVERS.json")
    with open(path, "w") as fjson:
        json.dump(results, fjson, indent=1)
    print(json.dumps({"metric": "train_levers", "results": results}))


if __name__ == "__main__":
    main()
