"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric: inference throughput in audio-seconds processed per second
per chip on SepReformer-B (the reference publishes no throughput numbers —
BASELINE.md — so ``vs_baseline`` is the real-time factor).

Measurement method: N forward (resp. train) steps are CHAINED inside one
jitted program with a data dependency between iterations, so the reported
time is true device compute — on this container's axon tunnel,
``block_until_ready`` returns before execution finishes and naive loops
measure dispatch latency (up to 100x optimistic).

Operating point: B=4 x 4 s is the measured throughput KNEE
(BENCH_SWEEP_infer.json / ARCHITECTURE.md "Batch scaling"): audio-s/s
falls monotonically with batch (639 @ B4 -> 423 @ B32) with superlinear
step-time growth despite exactly-linear compiled FLOPs/bytes, so larger
batches only lose.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    import jax

    # persist compiled executables across bench runs: the full train-step
    # compile takes minutes over the axon tunnel, the cache makes reruns
    # seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def cache_entries():
        try:
            return len(os.listdir(cache_dir))
        except OSError:
            return 0

    cache_before = cache_entries()

    # MFU denominator for every row: v5e peak is 197 TFLOP/s (bf16 MXU;
    # f32 matmuls run at bf16 default precision on this platform, so bf16
    # peak is the speed-of-light for both dtypes)
    PEAK_TFLOPS = 197.0

    import jax.numpy as jnp
    import numpy as np

    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.engine.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from sepreformer_tpu.models import SepReformer

    platform = jax.default_backend()
    variant = get_variant("SepReformer_Base_WSJ0")
    cfg = variant.model
    sr = variant.dataset.sampling_rate

    batch, t_samples = 4, 32000  # 4 x 4 s = 16 audio-seconds per step
    n_chain = 20
    audio_seconds = batch * t_samples / sr

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=0.05, size=(batch, t_samples)), jnp.float32)

    model = SepReformer(cfg)
    t0 = time.perf_counter()
    variables = jax.jit(model.init)(jax.random.key(0), x[:1, :16000])
    jax.block_until_ready(variables)
    init_time = time.perf_counter() - t0

    # ---- inference: chained forwards --------------------------------------
    @jax.jit
    def infer_chain(variables, x):
        def body(i, x):
            audio, _ = model.apply(variables, x)
            return x + 1e-6 * audio.sum(axis=0)
        return jax.lax.fori_loop(0, n_chain, body, x).sum()

    t0 = time.perf_counter()
    float(infer_chain(variables, x))
    compile_time = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(infer_chain(variables, x))
    infer_step = (time.perf_counter() - t0) / n_chain
    infer_throughput = audio_seconds / infer_step

    # FLOPs for utilization reporting come from FLOPS.json (committed;
    # produced by flops_account.py: XLA cost analysis of the all-XLA
    # no-Pallas model, so FLOPs inside pallas_call ARE counted — the
    # round-2 bench number 279.4 GF was the fused path's cost analysis,
    # which misses the fused-GCFN matmuls; see VERDICT r2 "MFU
    # accounting").  No cost-analysis compile happens here.
    def flops_entry(variant_name, want_batch, want_samples):
        try:
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "FLOPS.json")) as f:
                acct = json.load(f)
            if "variant" in acct:  # legacy flat (pre-round-4) layout
                acct = {acct["variant"]: acct}
            row = acct[variant_name]
            if (row.get("batch") == want_batch
                    and row.get("samples") == want_samples):
                return row["fwd_gflops"] * 1e9, row["train_gflops"] * 1e9
        except Exception:
            pass
        return None, None

    flops, train_flops = flops_entry("SepReformer_Base_WSJ0", batch,
                                     t_samples)

    # ---- training: chained train steps ------------------------------------
    state = create_train_state(variant, jax.random.key(0), sample_len=t_samples)
    train_step = make_train_step(variant, donate=False)
    src = jnp.stack([x * 0.5, x * 0.5])
    lr, alpha = jnp.float32(1e-3), jnp.float32(0.4)

    n_train_chain = 5

    @jax.jit
    def train_chain(state, x, src):
        def body(i, state):
            new_state, _ = train_step(
                state, x, src, lr, alpha, jax.random.fold_in(jax.random.key(1), i)
            )
            return new_state
        final = jax.lax.fori_loop(0, n_train_chain, body, state)
        return jax.tree.leaves(final.params)[0].sum()

    t0 = time.perf_counter()
    float(train_chain(state, x, src))
    train_compile_time = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(train_chain(state, x, src))
    train_step_time = (time.perf_counter() - t0) / n_train_chain
    train_throughput = audio_seconds / train_step_time

    # ---- Large variant row (VERDICT r3 item 7) ---------------------------
    # bf16 compute (its production dtype: the model axis / per-stage
    # SpkSplit / bf16 policy exist for Large), B=2 x 4 s — the measured
    # single-chip knee for feat_dim 256 (STATUS.md round-2 session 2).
    import dataclasses

    large_extras = {}
    try:
        lvariant = get_variant("SepReformer_Large_DM_WSJ0")
        lvariant = dataclasses.replace(
            lvariant,
            model=dataclasses.replace(lvariant.model,
                                      compute_dtype="bfloat16"),
        )
        lb, lt = 2, 32000
        l_audio_seconds = lb * lt / sr
        xl = jnp.asarray(rng.normal(scale=0.05, size=(lb, lt)), jnp.float32)
        lmodel = SepReformer(lvariant.model)
        t0 = time.perf_counter()
        lvars = jax.jit(lmodel.init)(jax.random.key(0), xl[:1, :16000])
        jax.block_until_ready(lvars)
        l_init = time.perf_counter() - t0

        @jax.jit
        def l_infer_chain(variables, x):
            def body(i, x):
                audio, _ = lmodel.apply(variables, x)
                return x + 1e-6 * audio.sum(axis=0).astype(x.dtype)
            return jax.lax.fori_loop(0, n_chain, body, x).sum()

        t0 = time.perf_counter()
        float(l_infer_chain(lvars, xl))
        l_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(l_infer_chain(lvars, xl))
        l_step = (time.perf_counter() - t0) / n_chain

        lstate = create_train_state(lvariant, jax.random.key(0),
                                    sample_len=lt)
        l_train_step = make_train_step(lvariant, donate=False)
        lsrc = jnp.stack([xl * 0.5, xl * 0.5])

        @jax.jit
        def l_train_chain(state, x, src):
            def body(i, state):
                new_state, _ = l_train_step(
                    state, x, src, lr, alpha,
                    jax.random.fold_in(jax.random.key(1), i),
                )
                return new_state
            final = jax.lax.fori_loop(0, 5, body, state)
            return jax.tree.leaves(final.params)[0].sum()

        t0 = time.perf_counter()
        float(l_train_chain(lstate, xl, lsrc))
        l_train_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(l_train_chain(lstate, xl, lsrc))
        l_train_step_s = (time.perf_counter() - t0) / 5

        large_extras = {
            "model": "SepReformer_Large_DM_WSJ0",
            "compute_dtype": "bfloat16",
            "batch": lb,
            "infer_step_ms": round(l_step * 1e3, 2),
            "infer_audio_s_per_s": round(l_audio_seconds / l_step, 2),
            "train_step_ms": round(l_train_step_s * 1e3, 2),
            "train_audio_s_per_s": round(l_audio_seconds / l_train_step_s,
                                         2),
            "init_s": round(l_init, 2),
            "infer_compile_s": round(l_compile, 2),
            "train_compile_s": round(l_train_compile, 2),
        }
        l_flops, l_train_flops = flops_entry(
            "SepReformer_Large_DM_WSJ0", lb, lt)
        if l_flops:
            large_extras["fwd_gflops"] = round(l_flops / 1e9, 1)
            large_extras["infer_mfu_pct"] = round(
                l_flops / l_step / (PEAK_TFLOPS * 1e12) * 100, 2)
        if l_train_flops:
            large_extras["train_gflops"] = round(l_train_flops / 1e9, 1)
            large_extras["train_mfu_pct"] = round(
                l_train_flops / l_train_step_s / (PEAK_TFLOPS * 1e12) * 100, 2)
    except Exception as e:  # the Large row must never sink the headline
        large_extras = {"error": f"{type(e).__name__}: {str(e)[:200]}"}

    extras = {
        "platform": platform,
        "model": "SepReformer_Base_WSJ0",
        "batch": batch,
        "segment_seconds": t_samples / sr,
        "infer_step_ms": round(infer_step * 1e3, 2),
        "train_audio_seconds_per_second_per_chip": round(train_throughput, 2),
        "train_step_ms": round(train_step_time * 1e3, 2),
        "init_s": round(init_time, 2),
        "infer_compile_s": round(compile_time, 2),
        "train_compile_s": round(train_compile_time, 2),
        "measurement": f"chained x{n_chain} (data-dependent fori_loop)",
        # >0 new entries = this run compiled programs the committed
        # .jax_cache lacked; 0 with large compile_s = the residual is
        # cache-load/upload cost over the axon tunnel, not XLA compile
        "cache_entries_added": cache_entries() - cache_before,
        # measured r4: in the driver window the Base infer leg pays an
        # irreducible ~70 s of executable load/upload + first execution
        # over the axon tunnel (NOT XLA compilation — zero new cache
        # entries), plus window contention; back-to-back solo reruns on
        # frozen code report ~2% higher audio-s/s than the driver's
        # first-run number (736-739 vs 724 in r4)
        "measurement_note": "driver first-run includes ~70s executable "
                            "load floor; solo warm reruns ~2% higher",
        "large": large_extras,
    }
    peak_tflops = PEAK_TFLOPS
    if flops:
        extras["fwd_gflops"] = round(flops / 1e9, 1)
        extras["achieved_tflops"] = round(flops / infer_step / 1e12, 2)
        extras["infer_mfu_pct"] = round(
            flops / infer_step / (peak_tflops * 1e12) * 100, 2)
    if train_flops:
        extras["train_gflops"] = round(train_flops / 1e9, 1)
        extras["train_achieved_tflops"] = round(
            train_flops / train_step_time / 1e12, 2)
        extras["train_mfu_pct"] = round(
            train_flops / train_step_time / (peak_tflops * 1e12) * 100, 2)

    print(json.dumps({
        "metric": "infer_audio_seconds_per_second_per_chip",
        "value": round(infer_throughput, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(infer_throughput, 2),  # baseline = 1x real-time
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
