"""On-chip masked-eval validation + throughput table (round-3 verdict 4).

Two things the interpret-mode tests (tests/test_masked_eval.py,
tests/test_pallas_masked.py) cannot show:

1. **TPU-mode equivalence smoke**: a bucket-padded batch through the
   REAL masked kernels (fused_pv softmax·V, fused GCFN u-row masks,
   masked GroupNorm) must reproduce each utterance's solo forward.  On
   this chip f32 matmuls run at bf16 MXU precision, so the comparison is
   SI-SNR between the two outputs (>= 40 dB ≈ numerically identical for
   metric purposes), not bitwise.
2. **Masked batched-eval throughput** at eval_batch_size ∈ {1, 4, 8}
   with true lengths flowing — the cost of replacing the reference's
   forced batch-1 eval (dataset.py:30) with bucketed batches whose
   padding is masked in-kernel.

Chained fori_loop (bench.py method).  Writes MEASURE_MASKED_EVAL.json.
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

    variant = get_variant("SepReformer_Base_WSJ0")
    sr = variant.dataset.sampling_rate
    model = SepReformer(variant.model)

    rng = np.random.default_rng(0)
    bucket = 32000  # 4 s bucket
    # true lengths spread across the bucket (multiples of the encoder
    # stride, like the loader's static-shape pad)
    lens_all = np.asarray([32000, 27648, 24000, 30464,
                           22528, 29952, 25600, 28160], np.int64)
    waves = [rng.normal(scale=0.05, size=(n,)).astype(np.float32)
             for n in lens_all]

    x1 = jnp.zeros((1, 16000), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x1)
    jax.block_until_ready(variables)

    results: dict[str, object] = {}

    # ---- 1. equivalence smoke: padded+masked batch vs solo forwards ----
    batch = np.zeros((len(waves), bucket), np.float32)
    for i, w in enumerate(waves):
        batch[i, : len(w)] = w
    xb = jnp.asarray(batch)
    lens = jnp.asarray(lens_all, jnp.int32)

    masked_fwd = jax.jit(
        lambda v, x, l: model.apply(v, x, lengths=l)[0])
    out_masked = np.asarray(masked_fwd(variables, xb, lens))

    sisnrs = []
    for i, w in enumerate(waves):
        n = len(w)
        solo = jax.jit(
            lambda v, x: model.apply(v, x)[0],
        )(variables, jnp.asarray(w[None, :]))
        solo = np.asarray(solo)[:, 0]          # [S, n]
        got = out_masked[:, i, :n]             # [S, n]
        for s in range(got.shape[0]):
            a, b = got[s].astype(np.float64), solo[s].astype(np.float64)
            b = b * (a @ b) / max(b @ b, 1e-30)
            err = np.sum((a - b) ** 2)
            sisnrs.append(10.0 * np.log10(max(np.sum(b * b), 1e-30)
                                          / max(err, 1e-30)))
    results["equivalence_sisnr_db_min"] = round(float(np.min(sisnrs)), 1)
    results["equivalence_sisnr_db_mean"] = round(float(np.mean(sisnrs)), 1)
    print("masked-vs-solo SI-SNR dB: min",
          results["equivalence_sisnr_db_min"], "mean",
          results["equivalence_sisnr_db_mean"], flush=True)

    # ---- 2. masked batched-eval throughput -----------------------------
    n_chain = 20
    for b in (1, 4, 8):
        xs = jnp.asarray(batch[:b])
        ls = jnp.asarray(lens_all[:b], jnp.int32)
        audio_seconds = float(lens_all[:b].sum()) / sr

        @jax.jit
        def chain(v, x, l):
            def body(i, x):
                audio, _ = model.apply(v, x, lengths=l)
                return x + 1e-6 * audio.sum(axis=0)
            return jax.lax.fori_loop(0, n_chain, body, x).sum()

        t0 = time.perf_counter()
        float(chain(variables, xs, ls))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(variables, xs, ls))
        step_ms = (time.perf_counter() - t0) / n_chain * 1e3
        results[f"masked_eval_b{b}"] = {
            "step_ms": round(step_ms, 2),
            "true_audio_s_per_s": round(audio_seconds / (step_ms / 1e3), 1),
            "compile_s": round(compile_s, 1),
        }
        print(f"b={b}", results[f"masked_eval_b{b}"], flush=True)

    # ---- 3. loader-realistic batches (r4 verdict 5: the 20% "padding
    # tax" above is an artifact of this harness's single 32000 bucket;
    # the production loader sorts by length and pads each batch to its
    # OWN max rounded up to eval_bucket=4000 samples — measure that) ----
    order = np.argsort(-lens_all)
    bsz = 4
    total_s = 0.0
    total_audio = 0.0
    batches = []
    for i in range(0, len(order), bsz):
        idx = order[i:i + bsz]
        pad_to = int(-(-lens_all[idx].max() // 4000) * 4000)
        xs = np.zeros((len(idx), pad_to), np.float32)
        for row, j in enumerate(idx):
            xs[row, : lens_all[j]] = waves[j]
        batches.append((jnp.asarray(xs),
                        jnp.asarray(lens_all[idx], jnp.int32),
                        float(lens_all[idx].sum()) / sr, pad_to))
    for xs, ls, audio_seconds, pad_to in batches:
        @jax.jit
        def chain(v, x, l):
            def body(i, x):
                audio, _ = model.apply(v, x, lengths=l)
                return x + 1e-6 * audio.sum(axis=0)
            return jax.lax.fori_loop(0, n_chain, body, x).sum()

        float(chain(variables, xs, ls))  # compile
        t0 = time.perf_counter()
        float(chain(variables, xs, ls))
        total_s += (time.perf_counter() - t0) / n_chain
        total_audio += audio_seconds
        print(f"loader batch pad_to={pad_to}", flush=True)
    results["loader_realistic_b4"] = {
        "true_audio_s_per_s": round(total_audio / total_s, 1),
        "batch_pad_shapes": [p for *_, p in batches],
        "note": "sorted batches, per-batch bucket pad (production loader)",
    }
    print("loader_realistic_b4", results["loader_realistic_b4"], flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "MEASURE_MASKED_EVAL.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
