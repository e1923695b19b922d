"""Run-loop engine: train / test / test_save / infer_sample.

Reproduces the reference Engine's observable behavior
(models/<VARIANT>/engine.py) on top of jitted steps:

- auto-resume from the latest ``epoch.NNNN`` checkpoint (engine.py:30-36)
- warmup LR stepped per-iteration during epoch 1 only (engine.py:61)
- plateau LR on valid loss for epoch > start_scheduling (engine.py:201)
- progressive aux-loss weighting alpha (engine.py:72)
- inline test at ``test_epochs`` (engine.py:204-208)
- best-checkpoint saving (proper best tracking; the reference resets its
  best-loss each epoch — engine.py:194 — a quirk we do not replicate)
- per-utterance metric CSVs during test (engine.py:118-136)
- ``test_save`` writes peak-normalized (x0.5) wavs (engine.py:137-144)
- ``infer_sample`` pads to an encoder-stride multiple and writes x0.9
  peak-normalized in/out wavs (engine.py:152-172)
"""

from __future__ import annotations

import csv
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sepreformer_tpu.config import VariantConfig
from sepreformer_tpu.data.audio import peak_normalize, read_wav, write_wav
from sepreformer_tpu.data.dataset import DataLoader
from sepreformer_tpu.engine.checkpoint import (
    latest_epoch,
    load_checkpoint,
    save_checkpoint,
)
from sepreformer_tpu.engine.lr_control import LRController
from sepreformer_tpu.engine.train import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_forward_fn,
    make_train_step,
    make_train_step_group,
)
from sepreformer_tpu.losses import progressive_alpha
from sepreformer_tpu.metrics import pit_sisnri_np, sdri_np

log = logging.getLogger("sepreformer_tpu")


def apply_cmvn(x: np.ndarray, lengths: Optional[np.ndarray] = None) -> np.ndarray:
    """Per-utterance mean/variance normalization (utils/functions.py:1-4),
    applied when engine.mvn is set (engine.py:57).

    With ``lengths`` the statistics span only each row's true samples, so
    bucket padding does not shift them (the reference normalizes the
    unpadded utterance)."""
    if lengths is None:
        return (x - x.mean(axis=-1, keepdims=True)) / (
            x.std(axis=-1, keepdims=True) + 1e-8
        )
    lengths = np.asarray(lengths)
    m = np.arange(x.shape[-1])[None] < lengths[:, None]
    cnt = lengths[:, None].astype(np.float64)
    mean = (x * m).sum(-1, keepdims=True) / cnt
    var = (np.square(x - mean) * m).sum(-1, keepdims=True) / cnt
    return ((x - mean) / (np.sqrt(var) + 1e-8)).astype(x.dtype) * m


class Engine:
    """Epoch driver.  ``workdir`` plays the role of the reference's
    model directory (checkpoints under ``<workdir>/log/scratch_weights``)."""

    def __init__(
        self,
        cfg: VariantConfig,
        workdir: str,
        dataloaders: Optional[Dict[str, DataLoader]] = None,
        seed: int = 0,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        if (mesh is not None
                and cfg.sharding.model_parallel_size > 1):
            # Pallas-kernel policy under tensor parallelism: pallas_call
            # operands have NO partitioning rule when pjit shards over the
            # model axis (GSPMD cannot see inside the kernel), so every
            # fused kernel resolves to its XLA path — XLA ops carry
            # sharding propagation and insert the collectives.
            from dataclasses import replace as _replace

            cfg = _replace(
                cfg,
                model=_replace(
                    cfg.model,
                    fused_ffn="off", fused_local="off", fused_pair="off",
                    fused_depthwise="off",
                    attention_impl="xla", attention_train_impl="xla",
                    relpos_materializer="gather",
                ),
                # the adam mu/nu sharding rules match per-leaf module
                # paths; a raveled opt_state has none
                optim=_replace(cfg.optim, flat_opt_state=False),
            )
        self.cfg = cfg
        self.workdir = workdir
        self.loaders = dataloaders or {}
        self.mesh = mesh
        os.makedirs(workdir, exist_ok=True)

        # checkpoint dir selection (engine.py:30-35): prefer pretrain dir
        # when it contains checkpoints
        pretrain = os.path.join(workdir, "log", "pretrain_weights")
        scratch = os.path.join(workdir, "log", "scratch_weights")
        self.ckpt_dir = pretrain if latest_epoch(pretrain) is not None else scratch

        self.rng = jax.random.key(seed)
        self.state = create_train_state(cfg, self.rng)
        self.lr_ctl = LRController(
            base_lr=cfg.optim.lr,
            warmup_steps=cfg.optim.warmup_steps,
            plateau_factor=cfg.optim.plateau_factor,
            plateau_patience=cfg.optim.plateau_patience,
            min_lr=cfg.optim.plateau_min_lr,
        )
        self.start_epoch = 1
        restored = load_checkpoint(self.ckpt_dir, self.state)
        if restored is not None:
            self.state, extra, ep = restored
            self.lr_ctl.load_state_dict(extra.get("lr_ctl", {}))
            self.start_epoch = ep + 1
            log.info("resumed from epoch %d (%s)", ep, self.ckpt_dir)

        self.train_step = make_train_step(cfg)
        self._group_step = None
        self._group_k = 0
        self.eval_step = make_eval_step(cfg)
        self.forward = make_forward_fn(cfg)
        self._local_eval_vars = None  # device-resident copy for _test
        self.best_valid = float("inf")
        self._writer = None

        # multi-chip: shard state over the mesh; batches follow in _prep
        self._batch_sharding = None
        self._sources_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding

            from sepreformer_tpu.parallel.mesh import (
                batch_spec,
                shard_train_state,
                sources_spec,
            )

            model_size = cfg.sharding.model_parallel_size
            data_size = mesh.shape["data"]
            global_batch = cfg.dataset.batch_size * jax.process_count()
            if "train" in self.loaders and global_batch % data_size:
                raise ValueError(
                    f"global train batch {global_batch} "
                    f"({cfg.dataset.batch_size} per host x "
                    f"{jax.process_count()} hosts) must be divisible by "
                    f"the data mesh axis size ({data_size})"
                )
            self.state = shard_train_state(self.state, mesh, model_size)
            self._batch_sharding = NamedSharding(mesh, batch_spec())
            self._sources_sharding = NamedSharding(mesh, sources_spec())

    # -- helpers -----------------------------------------------------------

    def _tb(self):
        if self._writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(
                    os.path.join(self.workdir, "log", "tensorboard")
                )
            except Exception:  # tensorboard optional
                self._writer = False
        return self._writer or None

    def _prep(self, batch):
        mix = batch.mixture
        if self.cfg.engine.mvn:
            mix = apply_cmvn(mix)
        if self._batch_sharding is not None and jax.process_count() > 1:
            # each host's loader yields its own shard of the global batch;
            # assemble the global array (concat over the data axis)
            import numpy as _np

            mix = jax.make_array_from_process_local_data(
                self._batch_sharding, _np.asarray(mix)
            )
            src = jax.make_array_from_process_local_data(
                self._sources_sharding, _np.asarray(batch.sources)
            )
            return mix, src
        mix = jnp.asarray(mix)
        src = jnp.asarray(batch.sources)
        if self._batch_sharding is not None:
            mix = jax.device_put(mix, self._batch_sharding)
            src = jax.device_put(src, self._sources_sharding)
        return mix, src

    # -- phases ------------------------------------------------------------

    def _train_epoch(self, epoch: int) -> Dict[str, float]:
        loader = self.loaders["train"]
        loader.set_epoch(epoch)
        alpha = progressive_alpha(
            epoch,
            self.cfg.criterion.alpha,
            self.cfg.criterion.alpha_decay_start_epoch,
            self.cfg.criterion.alpha_decay_factor,
            self.cfg.criterion.alpha_decay_every,
        )
        k = max(1, self.cfg.engine.steps_per_dispatch)
        if k > 1 and jax.process_count() > 1:
            # grouping stacks host batches into one [K, B, T] device put,
            # which has no multi-process global-array assembly path yet
            raise ValueError(
                "engine.steps_per_dispatch > 1 is single-process only; "
                "set it to 1 for multi-host runs"
            )
        # per-step losses accumulate as DEVICE scalars and convert to host
        # floats only at logging points / epoch end: a float() per step is
        # a synchronous device round trip, and on a dispatch tunnel that
        # latency (not compute) dominates the k=1 step loop.  Each drain
        # is ONE batched jax.device_get (async copies for every pending
        # scalar before blocking) folded into running (sum, count) totals,
        # so neither device-buffer count nor sync cost grows with epoch
        # length.
        pend_t: list = []
        pend_m: list = []
        totals = {"t": 0.0, "m": 0.0, "n": 0}

        def drain():
            if not pend_t:
                return
            ts, ms = jax.device_get((pend_t, pend_m))
            totals["t"] += float(np.sum(np.asarray(ts, np.float64)))
            totals["m"] += float(np.sum(np.asarray(ms, np.float64)))
            totals["n"] += len(ts)
            pend_t.clear()
            pend_m.clear()

        def account(time_loss, mag_loss):
            pend_t.append(time_loss)
            pend_m.append(mag_loss)
            n = totals["n"] + len(pend_t)
            every = self.cfg.engine.log_every_steps
            if every and n % every == 0:
                # running-mean postfix, the reference's tqdm equivalent
                # (engine.py:78-80); forces a sync, but only at the
                # user-chosen cadence
                drain()
                spks = self.cfg.model.num_spks
                log.info(
                    "epoch %d step %d/%d: T_loss %.4f F_loss %.4f lr %.2e",
                    epoch, n, len(loader),
                    totals["t"] / n / spks,
                    totals["m"] / n / spks,
                    self.lr_ctl.lr,
                )

        def flush(group):
            if not group:
                return
            if k == 1 or len(group) < k:
                # leftover tail: reuse the already-compiled single step
                # instead of compiling a second scan program for this size
                for mix, src, lr, rng in group:
                    self.state, metrics = self.train_step(
                        self.state, mix, src, lr, jnp.float32(alpha), rng,
                    )
                    # device scalars, deferred conversion (see account)
                    account(metrics["time_loss"], metrics["mag_loss_mean"])
                return
            if self._group_step is None or self._group_k != len(group):
                self._group_step = make_train_step_group(
                    self.cfg, len(group)
                )
                self._group_k = len(group)
            mixes = jnp.stack([g[0] for g in group])
            srcs = jnp.stack([g[1] for g in group])
            lrs = jnp.stack([g[2] for g in group])
            if self._batch_sharding is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                mesh = self._batch_sharding.mesh
                mixes = jax.device_put(
                    mixes, NamedSharding(mesh, P(None, "data", None)))
                srcs = jax.device_put(
                    srcs, NamedSharding(mesh, P(None, None, "data", None)))
            # the SAME per-step keys the ungrouped path would consume, as
            # scan xs — dropout is identical across steps_per_dispatch
            rngs = jnp.stack([g[3] for g in group])
            self.state, metrics = self._group_step(
                self.state, mixes, srcs, lrs, jnp.float32(alpha), rngs,
            )
            times = np.asarray(metrics["time_loss"])
            mags = np.asarray(metrics["mag_loss_mean"])
            for tl, ml in zip(times, mags):
                account(float(tl), float(ml))

        group = []
        for batch in loader:
            if epoch == 1:
                self.lr_ctl.warmup_step()  # per-iteration warmup (engine.py:61)
            mix, src = self._prep(batch)
            self.rng, step_rng = jax.random.split(self.rng)
            group.append((mix, src, jnp.float32(self.lr_ctl.lr), step_rng))
            if len(group) >= k:
                flush(group)
                group = []
        flush(group)
        drain()
        n = totals["n"]
        spks = self.cfg.model.num_spks
        return {"time_loss": totals["t"] / spks / max(1, n),
                "mag_loss": totals["m"] / spks / max(1, n)}

    def _validate(self) -> Dict[str, float]:
        loader = self.loaders["valid"]
        # accumulate device scalars; one sync at the end of the pass (a
        # float() per batch costs a tunnel round trip each — see
        # _train_epoch.account)
        pend = []
        for batch in loader:
            mix, src = self._prep(batch)
            metrics = self.eval_step(self.state, mix, src)
            pend.append((metrics["time_loss"], metrics["mag_loss_mean"]))
        spks = self.cfg.model.num_spks
        # one batched transfer for the whole pass (vs a sync per scalar)
        vals = jax.device_get(pend)
        tot_time = float(np.sum([float(t) for t, _ in vals])) / spks
        tot_mag = float(np.sum([float(m) for _, m in vals])) / spks
        n = len(pend)
        # valid loaders are host-sharded (build_dataloaders); the plateau
        # LR and best-checkpoint decisions branch on this value, so it must
        # be the identical global mean on every host or the cluster's
        # learning rates diverge
        from sepreformer_tpu.parallel.distributed import global_sum_scalars

        tot_time, tot_mag, n = global_sum_scalars((tot_time, tot_mag, n))
        return {"time_loss": tot_time / max(1.0, n),
                "mag_loss": tot_mag / max(1.0, n)}

    def _eval_fn(self):
        """(forward, params, batch_stats) for test-time eval — always
        HOST-LOCAL.

        Under a mesh, batch-1/ragged bucketed test batches cannot be
        sharded over the data axis (global batch not divisible — the
        round-1 advisor reproduced a mid-train crash at the first inline
        test epoch), and on a pod each host evaluates its own shard of
        the test set at its own pace with no collective lockstep.  So the
        (possibly sharded) train state is pulled once per test pass into
        a replicated host-local copy on local device 0.
        """
        if self.mesh is None:
            return self.forward, self.state.params, self.state.batch_stats
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(self.mesh, PartitionSpec())
        pull = jax.jit(lambda p, s: (p, s), out_shardings=(rep, rep))
        host = jax.device_get(
            pull(self.state.params, self.state.batch_stats)
        )
        self._local_eval_vars = jax.device_put(host, jax.local_devices()[0])
        return (self.forward, *self._local_eval_vars)

    def _test(self, wav_dir: Optional[str] = None, compute_sdr: bool = True):
        """Per-utterance SI-SNRi (+SDRi) with CSV dumps (engine.py:113-149).

        Metrics run on host at true length in float64.  BSS-eval SDR is
        the slow host-side part (O(T) Toeplitz solves per utterance —
        reference runs it inline, engine.py:132-134); here it runs on a
        thread pool overlapped with the device forwards.  Multi-host: the
        test loader is host-sharded (each utterance evaluated exactly
        once); rows merge via per-host CSV shards on the shared workdir
        and the summary metrics are globally reduced.
        """
        from concurrent.futures import ThreadPoolExecutor

        forward, params, batch_stats = self._eval_fn()
        loader = self.loaders["test"]
        rows_sisnr = []
        sdr_futures = []
        tot_sisnri, n = 0.0, 0
        pool = ThreadPoolExecutor(max_workers=4) if compute_sdr else None
        for batch in loader:
            # batch > 1 (cfg.dataset.eval_batch_size): utterances are
            # length-sorted and bucket-padded.  The forward runs with the
            # masked exact-eval path (lengths=true sample counts), so
            # bucket/batch padding is invisible: every utterance's output
            # equals the reference's true-length batch-1 processing and
            # eval_batch_size > 1 is a pure throughput knob.
            mix = batch.mixture
            if self.cfg.engine.mvn:
                mix = apply_cmvn(mix, batch.input_sizes)
            # true lengths go in unconditionally: the flash-attention and
            # fused-GCFN kernels consume the mask in-kernel (no dense
            # fallback), masks are numeric no-ops for unpadded rows, and
            # a single lens-carrying executable serves every bucket (no
            # second masked/unmasked compile)
            audio = np.asarray(forward(
                params, batch_stats, jnp.asarray(mix),
                jnp.asarray(np.asarray(batch.input_sizes), jnp.int32),
            ))
            for j in range(batch.batch_size):
                t = int(batch.input_sizes[j])
                key = batch.keys[j]
                est = audio[:, j, :t]
                src = batch.sources[:, j, :t]
                mixture = batch.mixture[j, :t]
                mean_i, per_src = pit_sisnri_np(est, src, mixture)
                rows_sisnr.append([key, mean_i, *per_src])
                tot_sisnri += mean_i
                if compute_sdr:
                    sdr_futures.append(
                        (key, pool.submit(sdri_np, est, src, mixture))
                    )
                if wav_dir:
                    os.makedirs(wav_dir, exist_ok=True)
                    write_wav(os.path.join(wav_dir, f"{key}_mix.wav"),
                              peak_normalize(mixture, 0.5),
                              self.cfg.dataset.sampling_rate)
                    for i in range(est.shape[0]):
                        write_wav(
                            os.path.join(wav_dir, f"{key}_spk{i+1}.wav"),
                            peak_normalize(est[i], 0.5),
                            self.cfg.dataset.sampling_rate)
                n += 1
        rows_sdr, tot_sdri = [], 0.0
        if compute_sdr:
            for key, fut in sdr_futures:
                mean_s, per_s = fut.result()
                rows_sdr.append([key, mean_s, *per_s])
                tot_sdri += mean_s
            pool.shutdown()
        n_procs = jax.process_count()
        for name, rows in [("test_SISNRi_value.csv", rows_sisnr),
                           ("test_SDRi_value.csv", rows_sdr)]:
            if not rows and n_procs == 1:
                continue
            target = name if n_procs == 1 else (
                f".{name}.part{jax.process_index()}"
            )
            with open(os.path.join(self.workdir, target), "w",
                      newline="") as f:
                csv.writer(f).writerows(rows)
        if n_procs > 1:
            # merge per-host shards (shared workdir) into the reference's
            # single CSVs; summary metrics reduce across hosts
            from jax.experimental import multihost_utils

            from sepreformer_tpu.parallel.distributed import (
                global_sum_scalars,
            )

            tot_sisnri, tot_sdri, n = global_sum_scalars(
                (tot_sisnri, tot_sdri, n)
            )
            n = int(n)
            multihost_utils.sync_global_devices("sepreformer_test_csv")
            if jax.process_index() == 0:
                for name in ("test_SISNRi_value.csv", "test_SDRi_value.csv"):
                    merged = []
                    for p in range(n_procs):
                        part = os.path.join(self.workdir, f".{name}.part{p}")
                        with open(part, newline="") as f:
                            merged.extend(list(csv.reader(f)))
                        os.remove(part)
                    if merged:
                        merged.sort(key=lambda r: r[0])
                        with open(os.path.join(self.workdir, name), "w",
                                  newline="") as f:
                            csv.writer(f).writerows(merged)
        out = {"sisnri": tot_sisnri / max(1, n)}
        if compute_sdr:
            out["sdri"] = tot_sdri / max(1, n)
        log.info("test: %s over %d utterances", out, n)
        return out

    def infer_sample(self, sample_file: str, out_dir: Optional[str] = None,
                     chunk_seconds: Optional[float] = None):
        """Separate one wav file (engine.py:152-172).

        ``chunk_seconds`` switches to chunked overlap-add processing
        (sepreformer_tpu.serving) — linear-cost long-form serving with one
        compiled chunk shape instead of a per-length compile.
        """
        out_dir = out_dir or os.path.dirname(os.path.abspath(sample_file))
        wav, sr = read_wav(sample_file, sr=self.cfg.dataset.sampling_rate)
        if self.cfg.engine.mvn:
            # same preprocessing as _test/_prep (ref utils/functions.py:1-4
            # via engine.py:57) — a model trained on normalized input must
            # not be fed raw audio here
            wav = apply_cmvn(wav[None])[0]
        t = len(wav)
        stride = self.cfg.model.enc_stride
        chunk_len = (
            int(chunk_seconds * self.cfg.dataset.sampling_rate)
            if chunk_seconds else 0
        )
        if chunk_len and t > chunk_len:
            from sepreformer_tpu.serving import separate_chunked

            chunk_len -= chunk_len % stride

            def forward_batch(batch):
                out = self.forward(self.state.params,
                                   self.state.batch_stats,
                                   jnp.asarray(batch))
                return np.asarray(out).transpose(1, 0, 2)  # [N, spks, C]

            audio = separate_chunked(forward_batch, wav, chunk_len)
        else:
            pad = (-t) % stride
            x = np.pad(wav, (0, pad))[None].astype(np.float32)
            audio = np.asarray(
                self.forward(self.state.params, self.state.batch_stats,
                             jnp.asarray(x))
            )[:, 0, :t]
        stem = os.path.splitext(os.path.basename(sample_file))[0]
        os.makedirs(out_dir, exist_ok=True)
        write_wav(os.path.join(out_dir, f"{stem}_in.wav"),
                  peak_normalize(wav, 0.9), sr)
        outs = []
        for i in range(audio.shape[0]):
            p = os.path.join(out_dir, f"{stem}_out_{i}.wav")
            write_wav(p, peak_normalize(audio[i], 0.9), sr)
            outs.append(p)
        return outs

    # -- main loop ---------------------------------------------------------

    def run(self, engine_mode: str = "train",
            out_wav_dir: Optional[str] = None) -> Dict[str, Any]:
        if "test" in engine_mode:
            return self._test(
                wav_dir=(out_wav_dir or os.path.join(self.workdir, "wav_out"))
                if engine_mode == "test_save" else None
            )
        history = []
        session_initial_valid = None
        for epoch in range(self.start_epoch, self.cfg.engine.max_epoch):
            t0 = time.time()
            if (self.cfg.engine.strict_reference_best
                    and session_initial_valid is None
                    and "valid" in self.loaders):
                # reference quirk (engine.py:187-194): the best tracker is
                # re-seeded from an initial validation pass every epoch
                session_initial_valid = self._validate()["time_loss"]
            train_m = self._train_epoch(epoch)
            valid_m = self._validate()
            valid_loss = valid_m["time_loss"]
            if self.cfg.engine.strict_reference_best:
                self.best_valid = session_initial_valid
            if epoch > self.cfg.engine.start_scheduling:
                self.lr_ctl.plateau_step(valid_loss)
            if epoch in self.cfg.engine.test_epochs and "test" in self.loaders:
                self._test(compute_sdr=False)
            nth = self.cfg.engine.save_every_n_epochs
            if valid_loss < self.best_valid or (nth and epoch % nth == 0):
                # best-checkpoint policy (util_engine.py:80-111) plus the
                # reference's (unused) periodic save_checkpoint_per_nth
                # (util_engine.py:49-78) as an opt-in crash-safety net
                if valid_loss < self.best_valid:
                    self.best_valid = valid_loss
                save_checkpoint(
                    self.ckpt_dir, epoch, self.state,
                    extra={
                        "lr_ctl": self.lr_ctl.state_dict(),
                        "train_loss": train_m["time_loss"],
                        "valid_loss": valid_loss,
                    },
                )
            writer = self._tb()
            if writer:
                writer.add_scalar("Loss_train", train_m["time_loss"], epoch)
                writer.add_scalar("Loss_valid", valid_loss, epoch)
                writer.add_scalar("LR", self.lr_ctl.lr, epoch)
            log.info(
                "epoch %d: train %.4f valid %.4f lr %.2e (%.1fs)",
                epoch, train_m["time_loss"], valid_loss, self.lr_ctl.lr,
                time.time() - t0,
            )
            history.append({"epoch": epoch, **train_m, "valid": valid_loss})
        return {"history": history}
