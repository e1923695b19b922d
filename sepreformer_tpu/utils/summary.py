"""Startup model summary: params + FLOPs, the TPU-native analog of the
reference's ptflops/thop/torchinfo check (engine.py:39-45,
util_engine.py:132-150).

Instead of three third-party MAC counters, we ask XLA itself:
``jit(fn).lower(x).compile().cost_analysis()`` returns the compiler's own
flops/bytes estimate for the exact program that will run.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np

log = logging.getLogger("sepreformer_tpu")


def model_summary(cfg, input_len: Optional[int] = None) -> Dict[str, float]:
    """Params and per-forward FLOPs for a variant at ``input_len`` samples
    (default: engine.dummy_len=16000, configs.yaml:130-131)."""
    import jax
    import jax.numpy as jnp

    from sepreformer_tpu.models import SepReformer

    input_len = input_len or cfg.engine.dummy_len
    model = SepReformer(cfg.model)
    x = jnp.zeros((1, input_len), jnp.float32)

    variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    n_params = sum(
        int(np.prod(v.shape)) for v in jax.tree.leaves(variables["params"])
    )

    def forward(variables, x):
        audio, _ = model.apply(variables, x)
        return audio

    flops = None
    try:
        compiled = jax.jit(forward).lower(variables, x).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception as e:  # cost analysis is best-effort per backend
        log.debug("cost_analysis unavailable: %s", e)

    seconds = input_len / cfg.dataset.sampling_rate
    out = {
        "params": n_params,
        "params_m": n_params / 1e6,
        "input_seconds": seconds,
    }
    if flops:
        out["gflops_per_forward"] = flops / 1e9
        # MACs ~ flops/2, per audio-second: comparable to the paper's G/s
        out["gmacs_per_audio_second"] = flops / 2 / seconds / 1e9
    log.info(
        "model %s: %.2fM params%s",
        cfg.name, out["params_m"],
        f", {out['gmacs_per_audio_second']:.1f} GMac/s" if flops else "",
    )
    return out
