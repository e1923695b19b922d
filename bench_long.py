"""Long-utterance inference benchmark: XLA vs flash attention crossover.

Full-utterance eval runs arbitrary lengths through the same graph; the
bottleneck attention length grows as T/64 samples, and the XLA path
materializes [B*spks, H, L, L] scores.  This measures where the Pallas
flash kernel wins and that long inputs run at all.

``python bench_long.py [--seconds 16 32 64] [--impl auto xla pallas]``

``--impls chunked`` measures the linear-cost chunked overlap-add serving
path (sepreformer_tpu.serving) at an 8 s chunk / 50% overlap.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", nargs="+", type=float, default=[16.0, 32.0, 64.0])
    p.add_argument("--impls", nargs="+", default=["xla", "pallas"])
    p.add_argument("--variant", default="SepReformer_Base_WSJ0")
    args = p.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.models import SepReformer

    base = get_variant(args.variant)
    sr = base.dataset.sampling_rate
    rng = np.random.default_rng(0)
    results = {}
    for impl in args.impls:
        if impl == "chunked":
            from sepreformer_tpu.serving import separate_chunked

            model = SepReformer(base.model)
            chunk_len = 8 * sr
            v = jax.jit(model.init)(
                jax.random.key(0), jnp.zeros((1, 16000), jnp.float32)
            )

            @jax.jit
            def fwd_batch(v, batch):
                audio, _ = model.apply(v, batch)
                return jnp.transpose(audio, (1, 0, 2))

            def forward_batch(batch):
                return np.asarray(fwd_batch(v, jnp.asarray(batch)))

            for seconds in args.seconds:
                t = int(seconds * sr) // 4 * 4
                wav = rng.normal(scale=0.05, size=(t,)).astype(np.float32)
                key = f"chunked/{seconds:g}s"
                separate_chunked(forward_batch, wav, chunk_len)  # compile
                t0 = time.perf_counter()
                n = 4
                for _ in range(n):
                    separate_chunked(forward_batch, wav, chunk_len)
                step = (time.perf_counter() - t0) / n
                results[key] = {
                    "step_ms": round(step * 1e3, 1),
                    "audio_s_per_s": round(seconds / step, 1),
                }
                print(key, results[key], flush=True)
            continue
        cfg = dataclasses.replace(base.model, attention_impl=impl)
        model = SepReformer(cfg)
        for seconds in args.seconds:
            t = int(seconds * sr) // 4 * 4
            x = jnp.asarray(rng.normal(scale=0.05, size=(1, t)), jnp.float32)
            key = f"{impl}/{seconds:g}s"
            try:
                v = jax.jit(model.init)(jax.random.key(0), x[:, :16000])
                n = 8

                @jax.jit
                def chain(v, x):
                    def body(i, x):
                        audio, _ = model.apply(v, x)
                        return x + 1e-6 * audio.sum(axis=0)
                    return jax.lax.fori_loop(0, n, body, x).sum()

                float(chain(v, x))
                t0 = time.perf_counter()
                float(chain(v, x))
                step = (time.perf_counter() - t0) / n
                results[key] = {
                    "step_ms": round(step * 1e3, 1),
                    "audio_s_per_s": round(seconds / step, 1),
                }
            except Exception as e:
                # classify instead of dumping raw transport errors into the
                # table (r4 shipped HTTP-500 strings as load-bearing cells)
                msg = str(e)
                if ("tpu_compile_helper" in msg or "INTERNAL" in msg
                        or "500" in msg):
                    status = "compile_failed_server_side"
                elif "RESOURCE_EXHAUSTED" in msg or "vmem" in msg.lower():
                    status = "out_of_memory"
                else:
                    status = "failed"
                results[key] = {
                    "status": status,
                    "error_type": type(e).__name__,
                    "note": msg.splitlines()[0][:120] if msg else "",
                }
            print(key, results[key], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
