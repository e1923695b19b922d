"""Command-line entry point, mirroring the reference ``run.py`` flags.

ref: run.py:5-28 — ``--model``, ``--engine-mode {train,test,test_save,
infer_sample}``, ``--sample-file``, ``--out-wav-dir`` (the reference README
documents ``test_wav``/``--out_wav_dir`` but the code accepts these; we
accept both spellings).  Extra flags cover what the reference hard-codes:
workdir, scp root, config YAML override, and mesh shape.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sepreformer-tpu",
        description="TPU-native SepReformer speech separation",
    )
    p.add_argument("--model", default="SepReformer_Base_WSJ0",
                   help="variant preset name (see --list-models)")
    p.add_argument("--engine-mode", default="train",
                   choices=["train", "test", "test_save", "test_wav",
                            "infer_sample"])
    p.add_argument("--sample-file", default=None)
    p.add_argument("--out-wav-dir", "--out_wav_dir", dest="out_wav_dir",
                   default=None)
    p.add_argument("--workdir", default=None,
                   help="checkpoint/log dir (default: models/<name>)")
    p.add_argument("--scp-root", default=".",
                   help="directory containing the scp_dir from the config")
    p.add_argument("--scp-dir", default=None,
                   help="override the config's scp manifest directory")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="SECTION.KEY=VALUE",
                   help="override any config field by dotted path, e.g. "
                        "--set optim.warmup_steps=100 (repeatable; the "
                        "reference has no CLI-over-YAML overrides)")
    p.add_argument("--batch-size", type=int, default=None,
                   help="override the config's train batch size")
    p.add_argument("--max-epoch", type=int, default=None,
                   help="override the config's training epoch count")
    p.add_argument("--config", default=None,
                   help="optional reference-format configs.yaml to load "
                        "instead of the named preset")
    p.add_argument("--checkpoint", default=None,
                   help="torch .pth checkpoint to convert and load")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="data-axis size (0 = all devices)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="model-axis size for Large variants")
    p.add_argument("--list-models", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--chunk-seconds", type=float, default=None,
                   help="infer_sample: chunked overlap-add long-form "
                        "processing with this chunk length (linear cost)")
    return p


def main(argv: Optional[list] = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )

    from sepreformer_tpu.config import (
        apply_override,
        available_variants,
        from_reference_yaml,
        get_variant,
    )

    if args.list_models:
        print("\n".join(available_variants()))
        return 0

    if args.config:
        cfg = from_reference_yaml(args.config, name=args.model)
    else:
        cfg = get_variant(args.model)

    from dataclasses import replace

    if args.scp_dir is not None:
        cfg = replace(cfg, dataset=replace(cfg.dataset, scp_dir=args.scp_dir))
    if args.batch_size is not None:
        cfg = replace(cfg, dataset=replace(cfg.dataset,
                                           batch_size=args.batch_size))
    if args.max_epoch is not None:
        cfg = replace(cfg, engine=replace(cfg.engine,
                                          max_epoch=args.max_epoch))
    for ov in args.overrides:
        if "=" not in ov:
            print(f"--set expects SECTION.KEY=VALUE, got {ov!r}",
                  file=sys.stderr)
            return 2
        dotted, _, raw = ov.partition("=")
        cfg = apply_override(cfg, dotted.strip(), raw.strip())

    if args.engine_mode == "test_wav":  # README spelling (README.md:109)
        args.engine_mode = "test_save"

    workdir = args.workdir or os.path.join("models", cfg.name)

    from sepreformer_tpu.data.dataset import build_dataloaders
    from sepreformer_tpu.engine.engine import Engine

    import jax

    # Persistent XLA compile cache: the full train-step compile costs
    # minutes on a tunneled TPU; caching makes resumes / re-runs of the
    # same config start in seconds.  Opt out with SEPREFORMER_NO_CACHE=1.
    if not os.environ.get("SEPREFORMER_NO_CACHE"):
        cache_dir = os.environ.get(
            "SEPREFORMER_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sepreformer_tpu.parallel.distributed import initialize_distributed

    initialize_distributed()
    host_id = jax.process_index()
    num_hosts = jax.process_count()

    # device mesh: explicit flags win; otherwise span all devices with a
    # pure data-parallel layout (the reference's DataParallel equivalent).
    # Train-mode only: eval/infer batches (often 1 utterance) don't divide
    # over the data axis.
    mesh = None
    if args.engine_mode == "train" and (
        jax.device_count() > 1 or args.model_parallel > 1
    ):
        from sepreformer_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(args.data_parallel, args.model_parallel)

    loaders = {}
    if args.engine_mode != "infer_sample":
        loaders = build_dataloaders(
            cfg.dataset, args.engine_mode, scp_root=args.scp_root,
            host_id=host_id, num_hosts=num_hosts, seed=args.seed,
        )

    # startup params/MACs check, as the reference does at Engine init
    # (engine.py:39-45); eval_shape + XLA cost analysis, no eager compute
    try:
        from sepreformer_tpu.utils.summary import model_summary

        model_summary(cfg)
    except Exception as e:
        logging.getLogger("sepreformer_tpu").debug("summary failed: %s", e)

    engine = Engine(cfg, workdir, loaders, seed=args.seed, mesh=mesh)

    if args.checkpoint:
        from sepreformer_tpu.models.convert import load_torch_checkpoint

        variables = load_torch_checkpoint(args.checkpoint, cfg.model)
        engine.state = engine.state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )

    if args.engine_mode == "infer_sample":
        if not args.sample_file:
            print("--sample-file is required for infer_sample", file=sys.stderr)
            return 2
        outs = engine.infer_sample(args.sample_file, args.out_wav_dir,
                                   chunk_seconds=args.chunk_seconds)
        print("\n".join(outs))
        return 0

    result = engine.run(args.engine_mode, out_wav_dir=args.out_wav_dir)
    if "sisnri" in result:
        print(f"SI-SNRi: {result['sisnri']:.2f} dB")
        if "sdri" in result:
            print(f"SDRi:    {result['sdri']:.2f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
