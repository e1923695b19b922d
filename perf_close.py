"""Round-2 perf close-out probes (one process, one chip, serial).

Answers the two perf questions VERDICT.md round 1 left open, with the
chained-fori_loop method of bench.py:

1. bf16-at-the-knee: quantify the bf16 inference regression at the B=4
   operating point (round-1 STATUS reported bf16 slower but never at the
   final operating point, and never with the TPU executable's own cost
   analysis attached).
2. superlinear batch scaling: BENCH_SWEEP_infer.json shows step time
   growing 2.6x from B=4->8 while the CPU-compiled FLOPs/bytes are
   exactly linear; this fetches the TPU executable's cost analysis at
   B=4 and B=16 to check whether the *TPU* bytes-accessed stays linear
   (if yes, the growth is scheduling/layout, not traffic).
3. train knee candidate: train step at B=8 vs the B=4 number in bench.py
   extras.

Prints one JSON line per probe and writes PERF_CLOSE.json.
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

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.engine.train import create_train_state, make_train_step
    from sepreformer_tpu.models import SepReformer

    results: dict[str, dict] = {}
    base = get_variant("SepReformer_Base_WSJ0")
    sr = base.dataset.sampling_rate
    t_samples = 4 * sr
    rng = np.random.default_rng(0)

    def timed_infer(variant, batch, tag, n_chain=10, cost=False):
        model = SepReformer(variant.model)
        variables = jax.jit(model.init)(jax.random.key(0),
                                        jnp.zeros((1, 16000), jnp.float32))
        x = jnp.asarray(rng.normal(scale=0.05, size=(batch, t_samples)),
                        jnp.float32)

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
        row = {"step_ms": round(step * 1e3, 2),
               "audio_s_per_s": round(batch * 4.0 / step, 1),
               "compile_s": round(compile_s, 1)}
        if cost:
            fwd = jax.jit(lambda v, x_: model.apply(v, x_)[0])
            compiled = fwd.lower(variables, x).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            row["tpu_gflops"] = round(float(ca.get("flops", 0)) / 1e9, 1)
            row["tpu_gbytes"] = round(
                float(ca.get("bytes accessed", 0)) / 1e9, 3)
        results[tag] = row
        print(json.dumps({tag: row}), flush=True)

    # 1+2. f32 knee point with TPU cost analysis, then b16 for scaling
    timed_infer(base, 4, "infer_f32_b4", cost=True)
    timed_infer(base, 16, "infer_f32_b16", n_chain=4, cost=True)

    # bf16 at the knee
    bf16 = dataclasses.replace(
        base, model=dataclasses.replace(base.model,
                                        compute_dtype="bfloat16"))
    timed_infer(bf16, 4, "infer_bf16_b4", cost=True)

    # single-block attention kernel serving eval (attention_impl="single"):
    # keeps the pe bias in VMEM, so the [L, d, L] pos_kt relayout copies
    # (~16% of the B=4 step) never materialize — candidate new default if
    # it wins here
    single = dataclasses.replace(
        base, model=dataclasses.replace(base.model,
                                        attention_impl="single"))
    timed_infer(single, 4, "infer_single_b4", cost=True)
    # b8 with the copies gone: if the superlinear batch scaling vanishes,
    # the rel-pos relayout copies were its cause
    timed_infer(single, 8, "infer_single_b8")

    # 3. train at B=8
    state = create_train_state(base, jax.random.key(0), sample_len=t_samples)
    train_step = make_train_step(base, donate=False)
    lr, alpha = jnp.float32(1e-3), jnp.float32(0.4)
    for batch in (8,):
        x = jnp.asarray(rng.normal(scale=0.05, size=(batch, t_samples)),
                        jnp.float32)
        src = jnp.stack([x * 0.5, x * 0.5])
        n_chain = 4

        @jax.jit
        def train_chain(state, x, src):
            def body(i, s):
                new_s, _ = train_step(
                    s, x, src, lr, alpha,
                    jax.random.fold_in(jax.random.key(1), i))
                return new_s
            final = jax.lax.fori_loop(0, n_chain, body, state)
            return jax.tree.leaves(final.params)[0].sum()

        t0 = time.perf_counter()
        float(train_chain(state, x, src))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(train_chain(state, x, src))
        step = (time.perf_counter() - t0) / n_chain
        tag = f"train_f32_b{batch}"
        results[tag] = {"step_ms": round(step * 1e3, 2),
                        "audio_s_per_s": round(batch * 4.0 / step, 1),
                        "compile_s": round(compile_s, 1)}
        print(json.dumps({tag: results[tag]}), flush=True)

    with open("PERF_CLOSE.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"metric": "perf_close", "results": results}))


if __name__ == "__main__":
    main()
