"""On-chip A/B: train-time attention paths for the full Base train step.

Three contenders at B=4 x 4 s (the bench operating point):

- "pallas"   — the single-block train kernel (attention_train.py):
  all-VMEM, but pays a barrel-shift band extraction in fwd AND bwd plus
  a sequential d(pe_pad) grid accumulation (~28 ms of the 151 ms step,
  profile_step.py family table: _fwd_impl + _bwd_impl).
- "fused_pv" — XLA batched dots produce one scores tensor off the
  layout-pinned Pallas pos_kt; ops/pallas/softmax_pv_train owns
  softmax + hash dropout + ·V fwd and (dV, dScores) bwd; dq/dk/dpe fall
  out of the einsum adjoints.
- "xla"      — the dense path (materializes probs/dropout-mask L²
  tensors through fwd+bwd).

Chained fori_loop over the real train step (bench.py method).  Writes
MEASURE_ATTENTION_TRAIN.json; the resolve_attention_train_impl "auto"
default follows this data.
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
    from sepreformer_tpu.engine.train import (
        create_train_state,
        make_train_step,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=0.05, size=(4, 32000)), jnp.float32)
    src = jnp.stack([x * 0.5, x * 0.5])
    lr, alpha = jnp.float32(1e-3), jnp.float32(0.4)
    n_chain = 5

    results: dict[str, dict] = {}
    for name, impl in (
        ("pallas", "pallas"),
        ("fused_pv", "fused_pv"),
        ("xla", "xla"),
    ):
        variant = get_variant("SepReformer_Base_WSJ0")
        variant = dataclasses.replace(
            variant,
            model=dataclasses.replace(
                variant.model, attention_train_impl=impl,
            ),
        )
        state = create_train_state(variant, jax.random.key(0),
                                   sample_len=32000)
        train_step = make_train_step(variant, donate=False)

        @jax.jit
        def chain(state, x, src):
            def body(i, state):
                new_state, _ = train_step(
                    state, x, src, lr, alpha,
                    jax.random.fold_in(jax.random.key(1), i),
                )
                return new_state
            final = jax.lax.fori_loop(0, n_chain, body, state)
            return jax.tree.leaves(final.params)[0].sum()

        t0 = time.perf_counter()
        float(chain(state, x, src))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(state, x, src))
        step_ms = (time.perf_counter() - t0) / n_chain * 1e3
        results[name] = {
            "step_ms": round(step_ms, 2),
            "compile_s": round(compile_s, 1),
        }
        print(name, results[name], flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "MEASURE_ATTENTION_TRAIN.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
