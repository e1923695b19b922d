"""Profile one jitted step on the real chip and print a per-op time table.

Captures a JAX profiler trace (works through the axon tunnel), then parses
the xplane with xprof's converters (hlo_stats tool) and aggregates device
time by HLO category / op name.

Usage:
    python profile_step.py --mode infer [--variant SepReformer_Base_WSJ0]
    python profile_step.py --mode train --top 40
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import tempfile
import time


def capture(mode: str, variant_name: str, batch: int, seconds: float,
            logdir: str, dtype: str | None, impl: str | None,
            materializer: str | None = None) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from sepreformer_tpu.config import get_variant
    from sepreformer_tpu.models import SepReformer

    variant = get_variant(variant_name)
    if dtype or impl or materializer:
        variant = dataclasses.replace(
            variant,
            model=dataclasses.replace(
                variant.model,
                **({"compute_dtype": dtype} if dtype else {}),
                **({"attention_impl": impl} if impl else {}),
                **({"relpos_materializer": materializer}
                   if materializer else {}),
            ),
        )
    sr = variant.dataset.sampling_rate
    t_samples = int(seconds * sr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=0.05, size=(batch, t_samples)), jnp.float32)

    if mode == "infer":
        model = SepReformer(variant.model)
        variables = jax.jit(model.init)(jax.random.key(0), x[:1, :16000])
        step = jax.jit(lambda v, x: model.apply(v, x)[0])
        out = step(variables, x)
        jax.block_until_ready(out)
        with jax.profiler.trace(logdir):
            for _ in range(5):
                out = step(variables, x)
            jax.block_until_ready(out)
    else:
        from sepreformer_tpu.engine.train import (
            create_train_state,
            make_train_step,
        )

        state = create_train_state(variant, jax.random.key(0),
                                   sample_len=t_samples)
        train_step = make_train_step(variant, donate=False)
        src = jnp.stack([x * 0.5, x * 0.5])
        lr, alpha = jnp.float32(1e-3), jnp.float32(0.4)
        step = jax.jit(
            lambda s, x, src, i: train_step(
                s, x, src, lr, alpha, jax.random.fold_in(jax.random.key(1), i)
            )
        )
        state, _ = step(state, x, src, 0)
        jax.block_until_ready(state.params)
        with jax.profiler.trace(logdir):
            for i in range(3):
                state, _ = step(state, x, src, i + 1)
            jax.block_until_ready(state.params)


def summarize(logdir: str, top: int) -> None:
    from xprof.convert import raw_to_tool_data

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    tools = raw_to_tool_data.xspace_to_tool_names(paths)
    tool = next((t for t in tools if t.startswith("hlo_stats")), None)
    if tool is None:
        raise SystemExit(f"hlo_stats not in {tools}")
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, tool, {})
    table = json.loads(data if isinstance(data, str) else data.decode())
    # Google DataTable format: {"cols": [{id,...}], "rows": [{"c": [{"v":..}]}]}
    col_ids = [c["id"] for c in table["cols"]]
    i_time = col_ids.index("total_self_time")
    i_cat = col_ids.index("category")
    i_expr = col_ids.index("hlo_op_expression")
    i_occ = col_ids.index("occurrences")

    import re

    by_cat: dict[str, float] = {}
    by_name: dict[str, float] = {}
    by_family: dict[str, float] = {}
    for row in table["rows"]:
        c = row["c"]
        t_us = float(c[i_time]["v"] or 0.0)
        cat = str(c[i_cat]["v"] or "?")
        name = str(c[i_expr]["v"] or "?")[:130]
        by_cat[cat] = by_cat.get(cat, 0.0) + t_us
        by_name[name] = by_name.get(name, 0.0) + t_us
        # family = op name with the %/.N instance suffix stripped, so all
        # instances of one kernel/fusion kind aggregate (e.g. %_bwd_impl.7
        # -> _bwd_impl); keeps the result shape to identify the site
        m = re.match(r"%([a-zA-Z_][\w-]*?)(?:[._]\d+)* = (\(?\w+\[[\d,]*\])",
                     name)
        fam = f"{m.group(1)} {m.group(2)}" if m else cat
        by_family[fam] = by_family.get(fam, 0.0) + t_us
    total = sum(by_cat.values())
    print(f"\n== device time by HLO category (total {total/1e3:.2f} ms over "
          f"profiled steps) ==")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{us/1e3:9.3f} ms  {100*us/max(total,1e-9):5.1f}%  {cat}")
    print(f"\n== device time by op family ==")
    for fam, us in sorted(by_family.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us/1e3:9.3f} ms  {100*us/max(total,1e-9):5.1f}%  {fam}")
    print(f"\n== top {top} ops ==")
    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us/1e3:9.3f} ms  {100*us/max(total,1e-9):5.1f}%  {name}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["infer", "train"], default="infer")
    p.add_argument("--variant", default="SepReformer_Base_WSJ0")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--dtype", default=None)
    p.add_argument("--impl", default=None)
    p.add_argument("--materializer", default=None)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--logdir", default=None)
    args = p.parse_args()

    logdir = args.logdir or tempfile.mkdtemp(prefix=f"prof_{args.mode}_")
    t0 = time.time()
    capture(args.mode, args.variant, args.batch, args.seconds, logdir,
            args.dtype, args.impl, args.materializer)
    print(f"captured in {time.time()-t0:.1f}s -> {logdir}")
    summarize(logdir, args.top)


if __name__ == "__main__":
    main()
