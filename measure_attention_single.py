"""On-chip A/B: attention_impl "auto" (XLA at L=500) vs "single".

STATUS.md round-2 session-2 staged the single-block train kernel's
forward (dropout 0) as an eval path (`attention_impl="single"`,
blocks.py:544-572): it keeps the relative-position bias in VMEM so the
[L, d, L] pos_kt relayout copies (~16% of the B=4 forward in the XLA
path) never materialize.  Equivalence is already tested; this script
takes the deferred on-chip measurement at the bench operating point
(B=4 x 4 s) to decide whether "auto" should prefer it at L <= 512.

Method: chained fori_loop (bench.py) so the axon tunnel's optimistic
block_until_ready cannot skew the numbers.  Prints one JSON line and
writes MEASURE_ATTENTION_SINGLE.json.
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

    variant = get_variant("SepReformer_Base_WSJ0")
    batch, t_samples = 4, 32000
    n_chain = 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=0.05, size=(batch, t_samples)),
                    jnp.float32)

    results: dict[str, dict] = {}
    out = None
    # one seeded init shared by both impls: the param tree is
    # impl-independent, and reusing the actual arrays makes the
    # cross-check a same-weights comparison by construction (not by the
    # init seed happening to match).  Note compile_s of the second impl
    # still benefits from the persistent compilation cache for any
    # sub-programs shared with the first — compare step_ms, not compile_s.
    variables = jax.jit(SepReformer(variant.model).init)(
        jax.random.key(0), x[:1, :16000])
    jax.block_until_ready(variables)
    for impl in ("auto", "single"):
        cfg = dataclasses.replace(variant.model, attention_impl=impl)
        model = SepReformer(cfg)

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
        step_ms = (time.perf_counter() - t0) / n_chain * 1e3
        results[impl] = {"step_ms": round(step_ms, 2),
                         "compile_s": round(compile_s, 1)}
        # numerical cross-check on the same weights (first impl's saved)
        audio, _ = jax.jit(model.apply)(variables, x)
        if out is None:
            out = np.asarray(audio)
        else:
            diff = float(np.max(np.abs(np.asarray(audio) - out)))
            results[impl]["max_abs_diff_vs_auto"] = diff

    payload = {
        "metric": "attention_single_vs_auto_infer_step_ms",
        "value": results["single"]["step_ms"],
        "unit": "ms",
        "vs_baseline": results["auto"]["step_ms"],
        "extras": {"batch": batch, "t_samples": t_samples,
                   "platform": jax.default_backend(), **results},
    }
    print(json.dumps(payload))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "MEASURE_ATTENTION_SINGLE.json"), "w") as f:
        json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
