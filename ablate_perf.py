"""Per-block ablation timings: where does the forward time go?

Times standalone stacks of each block type at the shapes they see inside
SepReformer-B (B=4, 4 s crops), using the chained-loop method.  Run on the
TPU container: ``python ablate_perf.py``.
"""

from __future__ import annotations

import json
import os
import time


def chain_time(apply_fn, variables, x, n=20):
    import jax

    @jax.jit
    def chain(variables, x):
        def body(i, x):
            y = apply_fn(variables, x)
            return x + 1e-6 * y
        return jax.lax.fori_loop(0, n, body, x).sum()

    float(chain(variables, x))  # compile
    t0 = time.perf_counter()
    float(chain(variables, x))
    return (time.perf_counter() - t0) / n


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.models.blocks import (
        CLA,
        GCFN,
        GlobalBlock,
        RelPos,
        SpkAttention,
    )
    from sepreformer_tpu.models.sepreformer import RelativePositionalEncoding

    cfg = get_variant("SepReformer_Base_WSJ0").model
    rng = np.random.default_rng(0)
    B, T, F, L = 4, 8000, cfg.feat_dim, 500  # stage-0 length, bottleneck 500
    x = jnp.asarray(rng.normal(size=(B, T, F)), jnp.float32)
    x_bn = jnp.asarray(rng.normal(size=(B, L, F)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(2 * cfg.pos_maxlen, cfg.head_dim)),
                     jnp.float32)

    results = {}

    def bench_block(name, module, inp, extra=None):
        key = jax.random.key(0)
        if extra is None:
            variables = module.init(key, inp)
            fn = lambda v, x: module.apply(v, x)
        else:
            variables = module.init(key, inp, extra)
            fn = lambda v, x: module.apply(v, x, extra)
        ms = chain_time(fn, variables, inp, n=20) * 1e3
        results[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", flush=True)

    for impl in ("xla", "pallas"):
        pos = RelPos(table=pe, length=L, maxlen=cfg.pos_maxlen, impl=impl)
        gb = GlobalBlock(F, cfg.num_heads, 0.0)
        bench_block(f"global_block_T8000_{impl}", gb, x, pos)
        bench_block(f"global_block_T500_{impl}", gb, x_bn, pos)

    bench_block("cla_T8000", CLA(F, cfg.local_kernel, 0.0), x)
    bench_block("gcfn_T8000", GCFN(F, 0.0), x)
    bench_block("spk_attn_T8000", SpkAttention(F, cfg.num_heads, 2, 0.0), x)

    # block counts in SepReformer-B forward (num_stages=4):
    # enc: 5 stages x 2 x (global+local); dec: 4 stages x 3 x
    # (global+local+spk_attn); each local = CLA+GCFN, global = EGA+GCFN
    print(json.dumps(results))


if __name__ == "__main__":
    main()
