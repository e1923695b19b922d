"""Jitted train/eval steps.

The reference's per-batch hot loop (engine.py:55-77: forward -> 4 aux
magnitude losses + time loss -> progressive weighting -> backward -> clip ->
AdamW) becomes one fused jitted function.  The learning rate is an input
(host-driven warmup/plateau control, see engine.py:61,201) so LR changes
never trigger recompilation.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from sepreformer_tpu.config import VariantConfig
from sepreformer_tpu.losses import pit_sisnr_mag, pit_sisnr_time
from sepreformer_tpu.models import SepReformer
from sepreformer_tpu.ops.stft import make_stft_kernel


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def flatten_transformation(
    inner: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """Run ``inner`` on ONE raveled [n_params] vector instead of the
    param tree.

    Why tried: the model has ~1300 parameter leaves; per-leaf optimizer
    math lowers to ~1300 small fused loops whose fixed per-op cost the
    r4 train profile put at ~8 ms of the 122 ms step.  Adam/clip/decay
    are elementwise (or already-global reductions), so the flat vector
    computes the IDENTICAL update in one HBM-bound pass.  MEASURED
    NEUTRAL on v5e (MEASURE_TRAIN_LEVERS.json: within 0.4 ms) — the
    ravel of grads and the unravel of params are themselves ~1300 copy
    ops, costing what the per-leaf math did.  Kept as a knob for
    hardware where copy ops batch better.  The opt_state becomes flat
    vectors (mu/nu: [n]), which changes the checkpoint tree — resumes of
    runs checkpointed with per-leaf state must set
    ``optim.flat_opt_state=false``.  Requires a uniform param dtype
    (ravel_pytree would silently upcast mixed trees).
    """
    from jax.flatten_util import ravel_pytree

    def init(params):
        # .dtype works on tracers too (init may run under jit)
        dtypes = {np.dtype(l.dtype) for l in jax.tree.leaves(params)}
        if len(dtypes) > 1:
            raise ValueError(
                f"flat_opt_state needs a uniform param dtype, got {dtypes}")
        flat, _ = ravel_pytree(params)
        return inner.init(flat)

    def update(grads, state, params=None):
        gflat, unravel = ravel_pytree(grads)
        pflat = None if params is None else ravel_pytree(params)[0]
        uflat, new_state = inner.update(gflat, state, pflat)
        return unravel(uflat), new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: VariantConfig) -> optax.GradientTransformation:
    """AdamW + global-norm clip (configs.yaml:114-118, engine.py:76).

    The transformation is built with a *unit* learning rate; the actual LR
    is injected per step via ``optax.scale_by_learning_rate`` replacement —
    we instead scale the updates by the lr passed to ``train_step``.
    """
    tx = _raw_chain(cfg.optim)
    if getattr(cfg.optim, "flat_opt_state", False):
        tx = flatten_transformation(tx)
    return tx


def _raw_chain(o) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(o.clip_norm),
        optax.scale_by_adam(b1=o.b1, b2=o.b2, eps=o.eps),
        optax.add_decayed_weights(o.weight_decay),
        # lr applied in train_step (host-controlled scalar input)
        optax.scale(-1.0),
    )


def create_train_state(
    cfg: VariantConfig,
    rng: jax.Array,
    sample_len: Optional[int] = None,
) -> TrainState:
    """Initialize model + optimizer state.

    Jitted on accelerators: behind a dispatch tunnel (axon), eager
    initialization issues thousands of individual device calls; one
    compiled program avoids that.  On CPU the opposite holds — XLA:CPU
    compiles the single giant init program pathologically slowly (>2 min
    for the 4-stage model; this was the round-2 multichip-dryrun timeout)
    while eager init is a stream of small host ops — so CPU runs eagerly.
    """
    model = SepReformer(cfg.model)
    sample_len = sample_len or cfg.dataset.max_len
    tx = make_optimizer(cfg)

    def init(rng):
        x = jnp.zeros((1, sample_len), jnp.float32)
        variables = model.init(rng, x)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", FrozenDict()),
            opt_state=tx.init(variables["params"]),
        )

    if jax.default_backend() == "cpu":
        with jax.disable_jit():
            return init(rng)
    return jax.jit(init)(rng)


def make_loss_mel_fb(cfg: VariantConfig) -> Optional[jax.typing.ArrayLike]:
    """The mel filterbank for the magnitude loss when criterion.mel_opt is
    set (ref criterions.py:133: MelScale(80, 16000, frame_length/2+1));
    None otherwise."""
    if not cfg.criterion.mel_opt:
        return None
    from sepreformer_tpu.ops.stft import make_mel_filterbank

    # numpy constant: embeds host-side at lowering (an eager jnp.asarray
    # becomes a device constant fetched back synchronously at compile)
    return np.asarray(
        make_mel_filterbank(cfg.criterion.stft.frame_length // 2 + 1),
        np.float32,
    )


def compute_losses(
    cfg: VariantConfig,
    audio: jnp.ndarray,          # [spks, B, T]
    aux: jnp.ndarray,            # [stages, spks, B, T]
    sources: jnp.ndarray,        # [spks, B, T]
    stft_kernel: jnp.ndarray,
    mel_fb: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Progressive multi-loss (engine.py:67-74), alpha applied by caller."""
    time_loss = pit_sisnr_time(audio, sources, scale_inv=cfg.criterion.scale_inv)
    mag_losses = [
        pit_sisnr_mag(
            aux[i], sources, stft_kernel, cfg.criterion.stft.frame_shift,
            scale_inv=cfg.criterion.scale_inv, mel_fb=mel_fb,
        )
        for i in range(aux.shape[0])
    ]
    metrics = {"time_loss": time_loss}
    for i, ml in enumerate(mag_losses):
        metrics[f"mag_loss_{i}"] = ml
    metrics["mag_loss_mean"] = jnp.mean(jnp.stack(mag_losses))
    return time_loss, metrics


def _build_train_step(cfg: VariantConfig, debug_grads: bool = False):
    """The raw (unjitted) train-step function; see make_train_step."""
    model = SepReformer(cfg.model)
    tx = make_optimizer(cfg)
    flat = getattr(cfg.optim, "flat_opt_state", False)
    raw_tx = _raw_chain(cfg.optim) if flat else None
    # numpy constant (host-side embed at lowering; see make_loss_mel_fb)
    kernel = np.asarray(
        make_stft_kernel(
            cfg.criterion.stft.frame_length,
            cfg.criterion.stft.frame_shift,
            cfg.criterion.stft.window,
        ),
        np.float32,
    )
    num_spks = cfg.model.num_spks
    mel_fb = make_loss_mel_fb(cfg)

    def loss_fn(params, batch_stats, mixture, sources, alpha, rng):
        (audio, aux), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            mixture,
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        time_loss, metrics = compute_losses(cfg, audio, aux, sources, kernel,
                                            mel_fb)
        total = (
            (1.0 - alpha) * time_loss + alpha * metrics["mag_loss_mean"]
        ) / num_spks
        metrics["total_loss"] = total
        return total, (metrics, mutated["batch_stats"])

    accum = max(1, cfg.optim.accum_steps)

    def train_step(state: TrainState, mixture, sources, lr, alpha, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum == 1:
            (_, (metrics, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, mixture, sources, alpha, rng
            )
        else:
            # sequential micro-batches: peak activation memory is one
            # micro-batch's; the update sees the mean gradient
            batch = mixture.shape[0]
            if batch % accum:
                raise ValueError(
                    f"batch {batch} not divisible by accum_steps {accum}"
                )
            micro = batch // accum
            mb_mix = mixture.reshape(accum, micro, -1)
            mb_src = sources.reshape(
                sources.shape[0], accum, micro, -1
            ).transpose(1, 0, 2, 3)

            def body(carry, xs):
                stats, gacc = carry
                mix_i, src_i, i = xs
                (_, (m, new_stats)), g = grad_fn(
                    state.params, stats, mix_i, src_i, alpha,
                    jax.random.fold_in(rng, i),
                )
                gacc = jax.tree.map(jnp.add, gacc, g)
                return (new_stats, gacc), m

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (new_stats, gsum), metric_seq = jax.lax.scan(
                body, (state.batch_stats, zeros),
                (mb_mix, mb_src, jnp.arange(accum)),
            )
            grads = jax.tree.map(lambda g: g / accum, gsum)
            metrics = jax.tree.map(lambda m: m.mean(0), metric_seq)
        if flat:
            # one raveled pass end-to-end: clip/adam/decay, the lr scale
            # AND the param update all run on a single [n_params] vector
            # (the per-leaf path lowers to ~1300 small fused loops whose
            # fixed cost dominates — see flatten_transformation)
            from jax.flatten_util import ravel_pytree

            gflat, unravel = ravel_pytree(grads)
            pflat, _ = ravel_pytree(state.params)
            uflat, new_opt_state = raw_tx.update(gflat, state.opt_state,
                                                 pflat)
            new_params = unravel(pflat + lr * uflat)
            metrics["grad_norm"] = jnp.linalg.norm(gflat)
        else:
            updates, new_opt_state = tx.update(grads, state.opt_state,
                                               state.params)
            updates = jax.tree.map(lambda u: lr * u, updates)
            new_params = optax.apply_updates(state.params, updates)
            metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        if debug_grads:
            metrics["grads"] = grads
        return new_state, metrics

    return train_step


def make_train_step(cfg: VariantConfig, donate: bool = True,
                    debug_grads: bool = False):
    """Build the jitted train step.

    signature: (state, mixture [B,T], sources [spks,B,T], lr scalar,
    alpha scalar, dropout_rng) -> (state, metrics)

    ``debug_grads`` adds the raw (pre-clip) gradient tree to the metrics —
    for tests/debugging only.
    """
    step = _build_train_step(cfg, debug_grads)
    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_train_step_group(cfg: VariantConfig, k: int, donate: bool = True):
    """K sequential train steps in ONE dispatch (lax.scan).

    On hosts with per-dispatch latency (remote-dispatch tunnels, slow
    Python loops) the per-step round trip can exceed device compute; this
    groups K full optimizer steps device-side.  signature:
    (state, mixtures [K,B,T], sources [K,spks,B,T], lrs [K], alpha, rng)
    -> (state, metrics with a leading [K] axis).  Per-step LRs keep the
    reference's per-iteration warmup exact (engine.py:61).

    The scan body is the RAW step function, not the jitted one — a pjit
    nested inside a while-loop lowers each call-site separately (with
    per-constant device fetches), which took tens of minutes over a
    remote-dispatch tunnel.

    ``rngs`` is the [K] stack of the SAME per-step dropout keys the
    ungrouped path would use (scan xs), so a training run is bitwise
    identical across ``steps_per_dispatch`` settings — including
    dropout > 0 (round-1 verdict item: a fold_in stream here silently
    diverged from the per-step jax.random.split stream).
    """
    inner = _build_train_step(cfg)

    def group_step(state: TrainState, mixtures, sources, lrs, alpha, rngs):
        def body(carry, xs):
            mix, src, lr, rng = xs
            new_state, metrics = inner(carry, mix, src, lr, alpha, rng)
            return new_state, metrics

        return jax.lax.scan(
            body, state,
            (mixtures, sources, lrs, rngs),
        )

    donate_argnums = (0,) if donate else ()
    return jax.jit(group_step, donate_argnums=donate_argnums)


def make_eval_step(cfg: VariantConfig):
    """Validation losses under running BN stats, no dropout
    (engine.py:86-110)."""
    model = SepReformer(cfg.model)
    kernel = np.asarray(
        make_stft_kernel(
            cfg.criterion.stft.frame_length,
            cfg.criterion.stft.frame_shift,
            cfg.criterion.stft.window,
        ),
        np.float32,
    )

    mel_fb = make_loss_mel_fb(cfg)

    def eval_step(state: TrainState, mixture, sources):
        audio, aux = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, mixture
        )
        _, metrics = compute_losses(cfg, audio, aux, sources, kernel, mel_fb)
        return metrics

    return jax.jit(eval_step)


def make_forward_fn(cfg: VariantConfig):
    """Inference forward: mixture [B, T] -> separated [spks, B, T].

    ``lengths`` (optional [B] true sample counts) switches on the masked
    exact-eval path: bucket/batch padding becomes invisible and
    ``audio[:, b, :lengths[b]]`` matches the reference's true-length
    batch-1 output (see SepReformer.__call__).
    """
    model = SepReformer(cfg.model)

    def forward(params, batch_stats, mixture, lengths=None):
        audio, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, mixture,
            lengths=lengths,
        )
        return audio

    return jax.jit(forward)
