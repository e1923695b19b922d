"""One true FLOPs accounting (VERDICT r2 item 5).

The round-2 repo published two contradictory FLOPs/forward numbers:
``BENCH_r02`` extras said 279.4 GF (XLA cost analysis of the production
forward — which does NOT count FLOPs inside ``pallas_call``, i.e. the
fused GCFN kernels' two matmuls, ~60%% of the model's compute) while
ARCHITECTURE.md's roofline said 685 GF (the full-math count).

This script produces the single authoritative number both documents and
``bench.py`` consume: it compiles the model with every Pallas kernel
forced OFF (``fused_*="off"``, ``attention*="xla"``), so the XLA cost
analysis sees the complete computation — mathematically identical to the
production path, kernel fusion being a pure implementation detail.

Writes FLOPS.json {config: {fwd_gflops, train_gflops, batch, samples}}.
Run on any backend (FLOP counts are platform-independent); CPU works.

Usage: python flops_account.py [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def xla_only(variant):
    return dataclasses.replace(
        variant,
        model=dataclasses.replace(
            variant.model,
            fused_ffn="off", fused_local="off", fused_pair="off",
            fused_depthwise="off",
            attention_impl="xla", attention_train_impl="xla",
        ),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (counts are identical)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--variant", default="SepReformer_Base_WSJ0")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache_flops")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.engine.train import (
        create_train_state,
        make_train_step,
    )
    from sepreformer_tpu.models import SepReformer

    variant = xla_only(get_variant(args.variant))
    sr = variant.dataset.sampling_rate
    t_samples = int(args.seconds * sr)
    batch = args.batch

    model = SepReformer(variant.model)
    x = jnp.zeros((batch, t_samples), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x[:1, :16000])

    def cost(compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))

    fwd = jax.jit(lambda v, x: model.apply(v, x)[0])
    fwd_flops, fwd_bytes = cost(fwd.lower(variables, x).compile())

    state = create_train_state(variant, jax.random.key(0),
                               sample_len=t_samples)
    train_step = make_train_step(variant, donate=False)
    src = jnp.zeros((variant.model.num_spks, batch, t_samples), jnp.float32)
    lowered = jax.jit(train_step).lower(
        state, x, src, jnp.float32(1e-3), jnp.float32(0.4),
        jax.random.key(1),
    )
    train_flops, train_bytes = cost(lowered.compile())

    out = {
        "variant": args.variant,
        "batch": batch,
        "samples": t_samples,
        "method": ("XLA cost analysis of the all-XLA (no-Pallas) model — "
                   "counts every FLOP the production fused path computes"),
        "fwd_gflops": round(fwd_flops / 1e9, 1),
        "fwd_gbytes": round(fwd_bytes / 1e9, 3),
        "train_gflops": round(train_flops / 1e9, 1),
        "train_gbytes": round(train_bytes / 1e9, 3),
        "backend": jax.default_backend(),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "FLOPS.json")
    # one file, one entry per variant (bench.py reads its variant's row);
    # a legacy flat file (pre-round-4) is folded into its variant key
    acct: dict = {}
    try:
        with open(path) as f:
            acct = json.load(f)
        if "variant" in acct:
            acct = {acct["variant"]: acct}
    except Exception:
        acct = {}
    acct[args.variant] = out
    with open(path, "w") as f:
        json.dump(acct, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
