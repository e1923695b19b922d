"""Data-parallel scaling benchmark over a device mesh.

On real multi-chip hardware this reports audio-seconds/s/chip at each mesh
size and the scaling efficiency vs 1 chip.  In this container only one TPU
chip exists, so ``--cpu-mesh N`` validates the mechanics on N virtual CPU
devices (throughput numbers there measure host cores, not TPUs — the
point is that the sharded step executes and scales structurally).

Prints one JSON line: {"metric": "scaling_efficiency", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu-mesh", type=int, default=0,
                   help="force N virtual CPU devices")
    p.add_argument("--batch-per-device", type=int, default=2)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--variant", default="SepReformer_Base_WSJ0")
    p.add_argument("--train", action="store_true",
                   help="measure the train step instead of inference")
    p.add_argument("--tiny", action="store_true",
                   help="use a tiny model (CPU-mesh mechanics validation)")
    args = p.parse_args()

    if args.cpu_mesh:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
            ).strip()

    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding

    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.engine.train import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )
    from sepreformer_tpu.parallel.mesh import (
        batch_spec,
        create_mesh,
        shard_train_state,
        sources_spec,
    )

    variant = get_variant(args.variant)
    if args.tiny:
        import dataclasses

        from sepreformer_tpu.config import ModelConfig

        variant = dataclasses.replace(
            variant,
            model=ModelConfig(
                num_stages=2, num_spks=2, enc_dim=32, enc_kernel=16,
                enc_stride=4, feat_dim=32, num_heads=4, pos_maxlen=64,
                local_kernel=9, down_kernel=5, dropout=0.1,
            ),
        )
    sr = variant.dataset.sampling_rate
    t_samples = int(args.seconds * sr)
    n_devices = len(jax.devices())

    results = {}
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_devices]
    rng = np.random.default_rng(0)
    for nd in sizes:
        mesh = create_mesh(data=nd, model=1)
        batch = args.batch_per_device * nd
        x = jnp.asarray(
            rng.normal(scale=0.05, size=(batch, t_samples)), jnp.float32
        )
        src = jnp.stack([x * 0.5, x * 0.5])
        state = shard_train_state(
            create_train_state(variant, jax.random.key(0),
                               sample_len=t_samples),
            mesh, 1,
        )
        x = jax.device_put(x, NamedSharding(mesh, batch_spec()))
        src = jax.device_put(src, NamedSharding(mesh, sources_spec()))
        if args.train:
            step = make_train_step(variant, donate=False)
            run = lambda: step(state, x, src, jnp.float32(1e-3),
                               jnp.float32(0.4), jax.random.key(1))
            out = run()
            jax.block_until_ready(out[0].params)
            n_iter, t0 = 3, time.perf_counter()
            for _ in range(n_iter):
                out = run()
            jax.block_until_ready(out[0].params)
        else:
            step = make_eval_step(variant)
            out = step(state, x, src)
            jax.block_until_ready(out)
            n_iter, t0 = 5, time.perf_counter()
            for _ in range(n_iter):
                out = step(state, x, src)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n_iter
        audio_seconds = batch * args.seconds
        results[nd] = {
            "audio_s_per_s": audio_seconds / dt,
            "per_device": audio_seconds / dt / nd,
        }

    base = results[sizes[0]]["per_device"]
    eff = {
        nd: results[nd]["per_device"] / base for nd in sizes
    }
    largest = sizes[-1]
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff[largest], 3),
        "unit": f"per-device efficiency at {largest} devices vs 1",
        "vs_baseline": round(eff[largest] / 0.8, 3),  # target >= 0.8
        "extras": {
            "platform": jax.default_backend(),
            "mode": "train" if args.train else "eval",
            "mesh_sizes": sizes,
            "throughput": {str(k): v for k, v in results.items()},
        },
    }))


if __name__ == "__main__":
    main()
