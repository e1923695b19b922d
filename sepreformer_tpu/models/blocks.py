"""Separator building blocks (flax.linen, channels-last [B, T, F]).

TPU-first layout: the feature dim F (128/256) stays on the last (lane) axis
through the whole separator, so every Linear lands on the MXU without the
permute churn of the reference's alternating [B,F,T]/[B,T,F] layouts.
Depthwise convs run channels-last via ``lax.conv_general_dilated`` with
``feature_group_count`` (VPU-friendly, XLA fuses the surrounding
elementwise work).

Behavioral reference for every block: modules/network.py in
dmlguq456/SepReformer (exact lines cited per class).  Initializers match
torch defaults (kaiming-uniform with a=sqrt(5) == U(+-1/sqrt(fan_in)) for
Linear/Conv, N(0,1) for Embedding) so training dynamics are comparable.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class RelPos(NamedTuple):
    """Relative-position context handed to global-attention blocks.

    table: [2*maxlen, head_dim] embedding table (the raw parameter);
    length: bottleneck length every EGA pools to (module.py:196-198);
    maxlen: clamp range; impl: attention implementation selector;
    pos_kt: the [L, d, L] gathered table (pos_k transposed to the bias
    dot's operand layout: j on lanes, d on sublanes), materialized ONCE by
    the separator and shared by every global block (the reference shares
    its [L, L, d] pos_k the same way, module.py:196-198).  The transpose
    is baked into the materialization because profiling showed each of the
    22 consuming blocks otherwise paid its own ~190 us relayout copy of
    the d-minor gather output on v5e.  (A Transformer-XL skewing path
    avoiding the [L, L, d] tensor entirely — relpos_bias_skew — measured
    3x SLOWER end-to-end: its [t, 2t-1] flatten forces misaligned
    relayouts on TPU.)
    """

    table: jnp.ndarray
    length: int
    maxlen: int
    impl: str = "auto"
    pos_kt: Optional[jnp.ndarray] = None
    train_impl: str = "auto"
    scores_dtype: str = "auto"


def rel_table(table: jnp.ndarray, t: int, maxlen: int) -> jnp.ndarray:
    """[2t-1, d] clamped relative-position rows for the skewing path.

    The skew reads row r at bias[i, j] with r = j - i + t - 1, and the
    reference bias is table[clip(i - j)] (module.py:53-54), so row r holds
    table[clip((t-1) - r, -maxlen, maxlen-1) + maxlen].
    """
    r = np.arange(2 * t - 1)
    idx = np.clip((t - 1) - r, -maxlen, maxlen - 1) + maxlen
    # keep the index a NUMPY constant: jnp.asarray here would execute
    # eagerly during tracing, creating a device-resident constant that
    # MLIR lowering fetches back synchronously (minutes over a dispatch
    # tunnel); numpy constants embed host-side for free
    return jnp.take(table, np.asarray(idx, np.int32), axis=0)


def gather_pos_kt(table: jnp.ndarray, t: int, maxlen: int) -> jnp.ndarray:
    """[t, d, t] clamped rel-pos tensor: pos_kt[i, :, j] = table[clip(i-j)]
    (module.py:196-198, 53-54), pre-transposed to the bias dot's operand
    layout (see RelPos docstring)."""
    pos = np.arange(t)
    rel = np.clip(pos[:, None] - pos[None, :], -maxlen, maxlen - 1) + maxlen
    pos_k = jnp.take(table, np.asarray(rel, np.int32), axis=0)  # [t, t, d]
    return jnp.swapaxes(pos_k, 1, 2)


def relpos_bias_skew(q: jnp.ndarray, pe_rel: jnp.ndarray) -> jnp.ndarray:
    """bias[b,h,i,j] = q[b,i,h,:] . pe_rel[j-i+t-1] via the skewing
    reshape: flat[i*(2t-2) + j + (t-1)] of s2 = q @ pe_rel^T — no [t,t,d]
    tensor, no gather; the slice fuses into the consumer add."""
    b, t, h, _ = q.shape
    s2 = jnp.einsum("bihd,rd->bhir", dot_operand(q),
                    dot_operand(pe_rel.astype(q.dtype)),
                    preferred_element_type=jnp.float32)  # [b,h,t,2t-1]
    if t == 1:
        return s2
    flat = s2.reshape(b, h, t * (2 * t - 1))
    flat = jax.lax.slice_in_dim(flat, t - 1, t - 1 + t * (2 * t - 2), axis=2)
    return flat.reshape(b, h, t, 2 * t - 2)[..., :t]


def dot_operand(x: jnp.ndarray) -> jnp.ndarray:
    """Upcast bf16 dot operands to f32 on CPU.

    jax 0.9's CPU thunk runtime cannot execute mixed-precision
    ``bf16 x bf16 -> f32`` dots ("Unsupported element type for
    DotThunk::Execute"); the TPU path is untouched (MXU takes bf16
    operands with f32 accumulation natively).
    """
    if x.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        return x.astype(jnp.float32)
    return x


def resolve_scores_dtype(setting: str) -> jnp.dtype:
    """Storage dtype of the fused_pv scores tensor (config.scores_dtype).

    "auto" = bf16 on TPU — MEASURED (MEASURE_ATTENTION_PV.json, v5e):
    21.7 vs 22.88 ms full-model B=4 forward, with the waveform diff
    vs the all-f32 XLA path UNCHANGED by the bf16 rounding (the scores
    come from bf16-precision MXU dots on this part either way).  The
    kernel upcasts to f32 for the softmax regardless; the dtype only
    changes what the scores producer writes to HBM and the kernel DMAs
    back (the path's dominant cost).  f32 elsewhere (CPU tests compare
    exactly against the f32 reference).
    """
    if setting == "bfloat16":
        return jnp.bfloat16
    if setting == "auto" and jax.default_backend() == "tpu":
        return jnp.bfloat16
    return jnp.float32


def relpos_store_dtype(setting: str) -> jnp.dtype:
    """Storage dtype for the materialized rel-pos bias path.

    "auto" -> f32.  bf16 storage was measured and REJECTED: the idea was
    to halve the [L, d, L] gather relayouts and [B, H, L, L] bias copies
    (~2.3 ms/step, ARCHITECTURE.md), but a bf16 bias operand makes XLA
    emit layout-pathological softmax fusions ({3,1,0,2}-major [B, H, L, L]
    tensors) and the full-model forward regressed 23.4 -> 28.3 ms on v5e.
    The knob stays for re-testing on other XLA versions."""
    if setting == "bfloat16":
        return jnp.bfloat16
    return jnp.float32


def _fused_pv_scores(q, k, v, pos, t: int, lp: int, d: int):
    """Shared scores producer for the fused_pv eval and train paths.

    q/k/v are [B, t, H, d]; pads them to the 128-aligned ``lp`` (Mosaic
    needs DMA-tileable score tiles; padded keys are masked in-kernel and
    padded query rows are sliced off by the caller), then computes
    scores = (QKᵀ + Q·pos_ktᵀ) / sqrt(d) with XLA's batched MXU dots and
    casts to the storage dtype (bf16 on TPU halves the tensor's HBM
    write+read — the path's dominant cost; the kernels' softmax is f32
    regardless).  Returns (scores [B, H, lp, lp], v padded [B, lp, H, d]).

    A two-tensor variant (emit qk and the bias product UNSUMMED, each
    dot writing bf16 directly, sum in the consuming kernel's VMEM —
    softmax_pv's ``bias`` argument) was measured and REJECTED on v5e
    (round 4): Base B=4 infer 21.66 → 22.85 ms, train 130.3 → 130.9.
    XLA already folds the add+cast into the dot epilogues, so the split
    only added a second HBM stream for the kernels to wait on.  The
    kernels keep bias support (tested) for re-evaluation on other XLA
    versions.
    """
    qp, kp, vp = (
        (jnp.pad(a, ((0, 0), (0, lp - t), (0, 0), (0, 0)))
         if lp != t else a)
        for a in (q, k, v)
    )
    scores = jnp.einsum(
        "bihd,bjhd->bhij", dot_operand(qp), dot_operand(kp),
        preferred_element_type=jnp.float32,
    )
    if pos.pos_kt is not None and pos.pos_kt.shape[0] == lp:
        pos_kt = pos.pos_kt
    else:
        pos_kt = gather_pos_kt(pos.table, lp, pos.maxlen)
        if pos.pos_kt is not None:
            pos_kt = pos_kt.astype(pos.pos_kt.dtype)
    scores = scores + jnp.einsum(
        "bihd,idj->bhij",
        dot_operand(qp.astype(pos_kt.dtype)),
        dot_operand(pos_kt),
        preferred_element_type=jnp.float32,
    ).astype(scores.dtype)
    scores = scores / math.sqrt(d)
    return scores.astype(resolve_scores_dtype(pos.scores_dtype)), vp


def resolve_attention_train_impl(impl: str, length: int = 0) -> str:
    """Train-time resolver.  "auto" on TPU at bottleneck lengths is
    "fused_pv": XLA batched dots + one scores tensor + the
    softmax·dropout·V train kernel (ops/pallas/softmax_pv_train) —
    MEASURED on v5e (B=4 x 4 s, f32, MEASURE_ATTENTION_TRAIN.json): full
    Base train step 131.9 ms vs 151.8 ms for the earlier single-block
    "pallas" kernel (whose fwd AND adjoint pay a barrel-shift band
    extraction) and 197.1 ms for the dense "xla" path (which
    materializes probs/dropout-mask L² tensors through fwd+bwd).  The
    "pallas" kernel remains selectable; beyond its 512-length ceiling
    both kernels hand off to "xla"."""
    if impl == "auto":
        from sepreformer_tpu.ops.pallas import softmax_pv_train

        # gate on the fused_pv train kernel's OWN padded-length ceiling
        # (it pads L up to a 128 multiple in-kernel), not the old
        # single-block kernel's — the two ceilings coincide today but are
        # independent knobs (r4 advisor finding)
        lp = ((length + 127) // 128) * 128 if length else 0
        if (jax.default_backend() == "tpu"
                and softmax_pv_train.supported_length(lp)):
            return "fused_pv"
        return "xla"
    return impl


def resolve_attention_impl(impl: str, length: int = 0) -> str:
    """'auto' on TPU — MEASURED bands (BENCH_LONG.json, v5e, B=1
    full-context forwards; MEASURE_ATTENTION_PV.json at B=4 4 s):

    - L <= 8192: "fused_pv" (XLA scores + Pallas masked-softmax·V).
      Wins at EVERY measured length since the r5 query+key-blocked
      streaming variant removed the Lp=2048 scratch ceiling (the
      full-row [Lp, Lp] scratch swaps to [LQ, KB] online-softmax tiles
      past ~10 MB): 21.7 vs 23.2 ms at the bottleneck (B=4 4 s), then
      17.8 / 55.8 / 171.7 / 571.3 ms at 8 / 16 / 32 / 64 s vs dense xla
      22.9 / 80.6 / 268.5 / — and flash 34.6 / 109.2 / 391.4 / — .
      (The r4 "dense xla wins at 16 s" band and the "dense stops
      compiling at 32 s" failure were BOTH one bug: the relpos pos_kt
      materializer's fixed 50-row out block blew the 16 MB scoped-vmem
      limit at t >= 2000 — ops/pallas/relpos.py::_pick_bi.)
    - L > 8192: "pallas" (flash).  fused_pv's [B·spks, H, Lp, Lp]
      scores tensor is XLA-materialized in HBM (~4.3 GB at L=8000,
      measured OK; ~17 GB at L=16000 — past the chip).  The flash
      kernel never materializes scores, so it is the memory-safe
      full-context fallback; linear-cost chunked serving
      (sepreformer_tpu.serving) remains the recommended long-form path.
    """
    if impl == "auto":
        if jax.default_backend() == "tpu":
            if length <= 8192:
                return "fused_pv"
            return "pallas"
        return "xla"
    return impl


def length_mask(seq_lens: jnp.ndarray, t: int, dtype=jnp.float32) -> jnp.ndarray:
    """[B, t, 1] 0/1 mask — position p of row b is valid iff p < seq_lens[b].

    Used by the exact masked-eval path (``seq_lens`` threading): padded
    positions in bucketed batches are made invisible to every op whose
    receptive field crosses the valid/pad boundary, so batched outputs
    reproduce the reference's true-length batch-1 processing exactly
    (ref pad_signal: module.py:220-234; forced batch 1: dataset.py:30).
    """
    pos = jnp.arange(t, dtype=jnp.int32)
    return (pos[None, :] < seq_lens[:, None]).astype(dtype)[..., None]


def torch_uniform_init(fan_in: int):
    """U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — torch Linear/Conv1d default."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch.nn.GELU default; jax.nn.gelu defaults to tanh."""
    return jax.nn.gelu(x, approximate=False)


def glu_last(x: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.GLU over the last axis: a * sigmoid(b)."""
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


class TorchLinear(nn.Module):
    """Dense with torch-default init (bias bound from fan_in).

    ``return_params=True`` materializes and returns (kernel, bias) without
    computing — used by fused kernels that consume the raw weights while
    keeping the parameter tree identical (requires ``in_features`` when no
    input is given).
    """

    features: int
    use_bias: bool = True
    in_features: Optional[int] = None

    @nn.compact
    def __call__(self, x=None, *, return_params: bool = False):
        fan_in = self.in_features if x is None else x.shape[-1]
        kernel = self.param(
            "kernel", torch_uniform_init(fan_in), (fan_in, self.features)
        )
        bias = (
            self.param("bias", torch_uniform_init(fan_in), (self.features,))
            if self.use_bias else None
        )
        if return_params:
            return kernel, bias
        y = jnp.einsum("...i,io->...o", x, kernel.astype(x.dtype))
        if bias is not None:
            y = y + bias.astype(x.dtype)
        return y


class DepthwiseConv1d(nn.Module):
    """Channels-last depthwise conv over time: [B, T, C] -> [B, T', C].

    padding: int pad on both sides, or "SAME".
    """

    kernel_size: int
    stride: int = 1
    padding: object = "SAME"
    use_bias: bool = True
    features: Optional[int] = None
    fused: str = "auto"  # large-kernel Pallas path: auto/on/off/interpret

    @nn.compact
    def __call__(self, x=None, *, return_params: bool = False):
        c = self.features if x is None else x.shape[-1]
        # fan_in for torch depthwise Conv1d = (in_ch/groups) * k = k
        kernel = self.param(
            "kernel", torch_uniform_init(self.kernel_size), (self.kernel_size, 1, c)
        )
        bias = (
            self.param("bias", torch_uniform_init(self.kernel_size), (c,))
            if self.use_bias else None
        )
        if return_params:
            return kernel, bias
        w = kernel.astype(x.dtype)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)]

        from sepreformer_tpu.ops.pallas.depthwise import (
            depthwise_large,
            supports,
        )

        use_large_kernel = (
            self.kernel_size > 8
            and self.kernel_size % 2 == 1
            and self.stride == 1
            and pad == "SAME"
            and supports(x.shape[1], c)
            and (
                self.fused in ("on", "interpret")
                or (self.fused == "auto" and jax.default_backend() == "tpu")
            )
        )
        if use_large_kernel:
            # XLA's grouped-conv fwd+grad lowerings dominated the train
            # step (~9 ms per CLA at full resolution on v5e); the Pallas
            # tap-loop kernel reads x/dy once (custom vjp included)
            b_arr = (bias.astype(x.dtype) if bias is not None
                     else jnp.zeros((c,), x.dtype))
            return depthwise_large(
                x, w[:, 0, :], b_arr, self.fused == "interpret"
            ).astype(x.dtype)
        if self.kernel_size <= 8 and self.stride == 1:
            # small-kernel depthwise == a handful of shifted multiply-adds;
            # XLA's grouped-conv lowering for this shape was measured at
            # 1.4 ms per GCFN on v5e while shifts fuse into neighbors
            if pad == "SAME":
                lo = (self.kernel_size - 1) // 2
                hi = self.kernel_size - 1 - lo
            else:
                (lo, hi), = pad
            xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
            t = x.shape[1]
            y = None
            for tap in range(self.kernel_size):
                term = xp[:, tap : tap + t] * w[tap, 0]
                y = term if y is None else y + term
        else:
            y = jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=(self.stride,),
                padding=pad,
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=c,
            )
        if bias is not None:
            y = y + bias.astype(x.dtype)
        return y


class LayerScale(nn.Module):
    """Residual-branch scaling, init 1e-5 (network.py:7-18)."""

    dim: int
    init_value: float = 1.0e-5

    @nn.compact
    def __call__(self, x=None, *, return_params: bool = False):
        scale = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, self.init_value, jnp.float32),
            (self.dim,),
        )
        if return_params:
            return scale
        return x * scale.astype(x.dtype)


class FoldableBatchNorm(nn.Module):
    """BatchNorm with ``nn.BatchNorm``-identical param/variable names and
    math (params scale/bias, batch_stats mean/var, f32 statistics, biased
    variance), plus ``return_folded=True`` which returns
    the running-stats normalization folded to an affine (s, t) with
    y = x*s + t — consumed by the fused CLA kernel.  The fold happens in
    regular jax (outside the kernel's custom_vjp), so gamma/beta gradients
    flow through it.

    Data-parallel semantics (SURVEY "hard parts" decision): under pjit
    with the batch sharded over the data mesh axis, the jnp.mean below is
    a GLOBAL-batch mean (GSPMD inserts the cross-replica reduction) —
    i.e. sync-BN by construction.  The reference's DataParallel computes
    per-GPU statistics that silently drift between replicas
    (ref modules/module.py BatchNorm1d under DP); global statistics are
    the deliberate improvement here, and single-device runs (where all
    parity tests execute) are bit-identical to the reference semantics."""

    features: int
    momentum: float = 0.9
    epsilon: float = 1.0e-5

    @nn.compact
    def __call__(self, x=None, *, use_running_average: bool = True,
                 return_folded: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), (self.features,))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), (self.features,))
        if return_folded:
            s = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            return s, bias - ra_mean.value * s
        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=red)
            var = jnp.mean(xf * xf, axis=red) - mean * mean
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype)


class TorchLayerNorm(nn.Module):
    """LayerNorm with f32 statistics and flax-compatible param names
    (scale/bias), exposing raw params for fused kernels."""

    dim: int
    epsilon: float = 1.0e-5

    @nn.compact
    def __call__(self, x=None, *, return_params: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        if return_params:
            return scale, bias
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        c = xf - mean
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        y = c * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype)


class GCFN(nn.Module):
    """Gated conv feed-forward (network.py:46-66).

    LN -> Linear(F->6F) -> depthwise k3 -> GLU -> drop -> Linear(3F->F)
    -> drop, LayerScale residual.
    """

    dim: int
    dropout: float
    layer_scale_init: float = 1.0e-5
    norm_eps: float = 1.0e-5
    fused: str = "auto"

    @nn.compact
    def __call__(self, x=None, *, train: bool = False,
                 return_params: bool = False,
                 seq_lens: Optional[jnp.ndarray] = None):
        norm = TorchLayerNorm(self.dim, epsilon=self.norm_eps, name="norm")
        proj_in = TorchLinear(self.dim * 6, in_features=self.dim,
                              name="proj_in")
        depthwise = DepthwiseConv1d(3, padding=1, features=self.dim * 6,
                                    name="depthwise")
        proj_out = TorchLinear(self.dim, in_features=self.dim * 3,
                               name="proj_out")
        layer_scale = LayerScale(self.dim, self.layer_scale_init,
                                 name="layer_scale")
        if return_params:
            # raw params for an externally-fused kernel (GlobalBlock's
            # EGA-tail+GCFN fusion) with an identical parameter tree
            lns, lnb = norm(return_params=True)
            win, bin_ = proj_in(return_params=True)
            wdw, bdw = depthwise(return_params=True)
            wout, bout = proj_out(return_params=True)
            ls = layer_scale(return_params=True)
            return (lns, lnb, win, bin_, wdw[:, 0, :], bdw, wout, bout, ls)

        from sepreformer_tpu.ops.pallas.gcfn import fused_gcfn, pick_block
        from sepreformer_tpu.ops.pallas.gcfn_train import pick_train_block

        train_dropout = train and self.dropout > 0.0
        # the train kernels hold more live [bt, 6F] arrays -> tighter
        # VMEM-budgeted block sizes for wide variants (Large: 6F=1536)
        block_ok = (
            pick_train_block(x.shape[1], self.dim * 6) > 0
            if train_dropout else pick_block(x.shape[1]) > 0
        )
        # masked exact-eval rides the fused kernel (u-row mask in VMEM);
        # only the train hash-dropout kernel takes no mask (training
        # always runs fixed-length crops)
        use_fused = (
            self.fused in ("on", "interpret")
            or (self.fused == "auto" and jax.default_backend() == "tpu")
        ) and block_ok and not (train_dropout and seq_lens is not None)
        if use_fused:
            lns, lnb = norm(return_params=True)
            win, bin_ = proj_in(return_params=True)
            wdw, bdw = depthwise(return_params=True)
            wout, bout = proj_out(return_params=True)
            ls = layer_scale(return_params=True)
            params = (lns, lnb, win, bin_, wdw[:, 0, :], bdw, wout, bout, ls)
            interpret = self.fused == "interpret"
            if train and self.dropout > 0.0:
                # hash-dropout variant with handwritten backward; the mask
                # pattern differs from flax Dropout's (same Bernoulli
                # distribution, different stream)
                from sepreformer_tpu.ops.pallas.gcfn_train import (
                    fused_gcfn_train,
                )

                rng = self.make_rng("dropout")
                seed = jax.random.randint(
                    rng, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
                )
                return fused_gcfn_train(
                    x, params, seed, self.norm_eps, float(self.dropout),
                    interpret,
                )
            mask = (None if seq_lens is None
                    else length_mask(seq_lens, x.shape[1], jnp.float32))
            return fused_gcfn(x, params, self.norm_eps, interpret, mask)
        y = norm(x)
        y = proj_in(y)
        if seq_lens is not None:
            # masked exact-eval: the k3 depthwise at the last valid frame
            # must read a ZERO beyond the valid length, exactly like the
            # reference conv's end zero-pad at true length
            y = y * length_mask(seq_lens, y.shape[1], y.dtype)
        y = depthwise(y)
        y = glu_last(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = proj_out(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + layer_scale(y)


class MultiHeadAttention(nn.Module):
    """Pre-LN MHA with additive relative-position bias (network.py:69-124).

    scores = (QK^T + Q pos_k^T) / sqrt(d_k); LayerScale on the output branch;
    NO inner residual (callers add their own, matching the reference).
    """

    dim: int
    num_heads: int
    dropout: float
    layer_scale_init: float = 1.0e-5
    norm_eps: float = 1.0e-5

    @nn.compact
    def __call__(self, x, pos: Optional["RelPos"] = None, *, train: bool = False,
                 key_lens: Optional[jnp.ndarray] = None):
        if x.ndim == 4:
            # [B, S, T, F] cross-speaker mode: attention over the S axis,
            # batched over (B, T) without the reference's reshape to
            # [B*T, S, F] (seq-len-2 attention tiles terribly on TPU —
            # 2 sublanes + two full-tensor transposes; measured >2x the
            # cost of any other block).  Same math, pure VPU elementwise.
            return self._speaker_axis_attention(x, train=train)
        b, t, _ = x.shape
        h = self.num_heads
        d = self.dim // h
        y = nn.LayerNorm(epsilon=self.norm_eps, name="norm")(x).astype(x.dtype)
        q = TorchLinear(self.dim, name="q")(y).reshape(b, t, h, d)
        k = TorchLinear(self.dim, name="k")(y).reshape(b, t, h, d)
        v = TorchLinear(self.dim, name="v")(y).reshape(b, t, h, d)

        def project_out(out):
            # shared output branch: out-projection -> dropout -> LayerScale
            # (one definition for every attention path — r4 advisor)
            out = TorchLinear(self.dim, name="out")(out)
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
            return LayerScale(self.dim, self.layer_scale_init,
                              name="layer_scale")(out)

        if train and pos is not None and key_lens is None:
            from sepreformer_tpu.ops.pallas.attention_train import (
                supported_length,
            )

            timpl = resolve_attention_train_impl(pos.train_impl, t)
            if timpl in ("fused_pv", "fused_pv_interpret"):
                # train-time fused_pv: XLA batched dots produce one scores
                # tensor; ops/pallas/softmax_pv_train owns softmax + hash
                # dropout + ·V fwd AND bwd (dV, dScores), and dq/dk/dpe
                # fall out of the einsum adjoints + the pos_kt
                # materializer's vjp.  Replaces the single-block train
                # kernel's barrel-shift band extraction/adjoint — measured
                # ~28 ms of the 151 ms B=4 train step (profile_step.py).
                from sepreformer_tpu.ops.pallas.softmax_pv_train import (
                    softmax_pv_dropout,
                )
                from sepreformer_tpu.ops.pallas.softmax_pv_train import (
                    supported_length as _pv_train_ok,
                )

                lp = ((t + 127) // 128) * 128
                if _pv_train_ok(lp):
                    if self.dropout > 0.0:
                        rng = self.make_rng("dropout")
                        seed = jax.random.randint(
                            rng, (), 0, jnp.iinfo(jnp.int32).max,
                            dtype=jnp.int32,
                        )
                    else:
                        seed = jnp.int32(0)
                    scores, vp = _fused_pv_scores(q, k, v, pos, t, lp, d)
                    out = softmax_pv_dropout(
                        scores, vp.reshape(b, lp, self.dim), seed, None,
                        t, float(self.dropout),
                        timpl == "fused_pv_interpret",
                    )[:, :t]
                    return project_out(out)
            if timpl in ("pallas", "pallas_interpret") and supported_length(t):
                from sepreformer_tpu.ops.pallas.attention_train import (
                    flash_relpos_attention_train,
                )

                if self.dropout > 0.0:
                    rng = self.make_rng("dropout")
                    seed = jax.random.randint(
                        rng, (), 0, jnp.iinfo(jnp.int32).max,
                        dtype=jnp.int32,
                    )
                else:
                    seed = jnp.int32(0)
                out = flash_relpos_attention_train(
                    q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3), pos.table.astype(x.dtype),
                    seed, pos.maxlen, float(self.dropout),
                    timpl == "pallas_interpret",
                )
                out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
                return project_out(out)

        impl = (
            resolve_attention_impl(pos.impl, t) if pos is not None else "xla"
        )
        # "single": the single-block TRAIN kernel's forward (dropout 0)
        # serving EVAL at bottleneck lengths — it keeps the pe bias
        # in-kernel, so the [L, d, L] pos_kt materialization and its
        # per-consumer relayout copies (~16% of the B=4 forward,
        # ARCHITECTURE.md profile) never exist.  Key masks (masked
        # batched eval) ride along in-kernel; falls back to the dense
        # path beyond the kernel's 512-length ceiling.
        use_single = (
            pos is not None
            and impl in ("single", "single_interpret")
            and (not train or self.dropout == 0.0)
        )
        if use_single:
            from sepreformer_tpu.ops.pallas.attention_train import (
                supported_length as _single_ok,
            )

            use_single = _single_ok(t)
        if use_single:
            from sepreformer_tpu.ops.pallas.attention_train import (
                flash_relpos_attention_train,
            )

            out = flash_relpos_attention_train(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), pos.table.astype(x.dtype),
                jnp.int32(0), pos.maxlen, 0.0,
                impl == "single_interpret", key_lens,
            )
            out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
            return project_out(out)
        # the inference Pallas kernel has no attention-prob dropout; use it
        # only for deterministic passes or dropout-free models.  Key masks
        # (masked batched eval / padded long utterances) are applied
        # in-kernel.
        use_flash = (
            pos is not None
            and impl in ("pallas", "pallas_interpret")
            and (not train or self.dropout == 0.0)
        )
        if use_flash:
            from sepreformer_tpu.ops.pallas.attention import (
                flash_relpos_attention,
            )

            qh = q.transpose(0, 2, 1, 3)
            kh = k.transpose(0, 2, 1, 3)
            vh = v.transpose(0, 2, 1, 3)
            out = flash_relpos_attention(
                qh, kh, vh, pos.table.astype(x.dtype), pos.maxlen,
                impl == "pallas_interpret", key_lens,
            )
            out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        else:
            # "fused_pv": XLA scores (its QKᵀ/bias dots run near the
            # bandwidth floor) + one Pallas pass for key-mask → softmax
            # → ·V (ops/pallas/softmax_pv) — the probs tensor and its
            # [L, L, H, B] layout copies never materialize, and V and
            # the output keep the model's native [B, T, F] layout.
            # q/k/v are padded to a 128-aligned length so the scores
            # tensor is DMA-tileable (padded keys masked in-kernel,
            # padded query rows sliced off).
            use_fused_pv = (
                impl in ("fused_pv", "fused_pv_interpret")
                and (not train or self.dropout == 0.0)
            )
            if use_fused_pv and pos is not None:
                lp = ((t + 127) // 128) * 128
                scores, vp = _fused_pv_scores(q, k, v, pos, t, lp, d)
                from sepreformer_tpu.ops.pallas.softmax_pv import (
                    softmax_pv,
                )

                out = softmax_pv(
                    scores, vp.reshape(b, lp, self.dim), key_lens, t,
                    impl == "fused_pv_interpret",
                )[:, :t]
                return project_out(out)
            scores = jnp.einsum(
                "bihd,bjhd->bhij", dot_operand(q), dot_operand(k),
                preferred_element_type=jnp.float32,
            )
            if pos is not None:
                if pos.pos_kt is not None and pos.pos_kt.shape[0] == t:
                    pos_kt = pos.pos_kt
                else:
                    pos_kt = gather_pos_kt(pos.table, t, pos.maxlen)
                    if pos.pos_kt is not None:
                        pos_kt = pos_kt.astype(pos.pos_kt.dtype)
                # bias product stored in the pos-table's dtype: bf16 on TPU
                # (see relpos_store_dtype) halves its unavoidable layout
                # copy; the add below upcasts and fuses
                bias_dt = (jnp.bfloat16 if pos_kt.dtype == jnp.bfloat16
                           else jnp.float32)
                bias = jnp.einsum(
                    "bihd,idj->bhij", dot_operand(q.astype(pos_kt.dtype)),
                    dot_operand(pos_kt),
                    preferred_element_type=bias_dt,
                )
                scores = scores + bias.astype(scores.dtype)
            scores = scores / math.sqrt(d)
            if key_lens is not None:
                # masked exact-eval: padded keys get -inf so softmax spans
                # only the utterance's true-length positions, matching the
                # reference's batch-1 attention span (module.py:220-234)
                kmask = jnp.arange(t, dtype=jnp.int32)[None] < key_lens[:, None]
                scores = jnp.where(
                    kmask[:, None, None, :], scores, jnp.float32(-1e30)
                )
            attn = jax.nn.softmax(
                scores.astype(jnp.float32), axis=-1
            ).astype(x.dtype)
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            out = jnp.einsum(
                "bhij,bjhd->bihd", attn, v, preferred_element_type=x.dtype
            ).reshape(b, t, self.dim)
        return project_out(out)

    def _speaker_axis_attention(self, x, *, train: bool):
        """x: [B, S, T, F] -> attention over S, numerically identical to
        running the 3D path on [B*T, S, F] (parameter names shared).

        For S == 2 (every shipped variant) and deterministic passes, the
        2-way softmax is a sigmoid of the score difference and everything
        stays in flat [B, T, F] layouts: per-head reductions/expansions go
        through a static block-diagonal head-pooling matmul.  The generic
        einsum path triggered a pathological conv lowering with T(2,128)
        layouts on TPU (~1 ms per block).
        """
        b, s, t, f = x.shape
        h = self.num_heads
        d = self.dim // h
        y = nn.LayerNorm(epsilon=self.norm_eps, name="norm")(x).astype(x.dtype)
        q = TorchLinear(self.dim, name="q")(y)
        k = TorchLinear(self.dim, name="k")(y)
        v = TorchLinear(self.dim, name="v")(y)

        if s == 2:
            # head-pool: [F, H] 0/1 block-diagonal; expand: its transpose
            pool = np.kron(
                np.eye(h, dtype=np.float32), np.ones((d, 1), np.float32)
            ).astype(np.dtype(x.dtype))  # numpy constant (host-side embed)
            q0, q1 = q[:, 0], q[:, 1]          # [B, T, F]
            k0, k1 = k[:, 0], k[:, 1]
            v0, v1 = v[:, 0], v[:, 1]
            scale = 1.0 / math.sqrt(d)

            def head_scores(qq, kk):
                return jnp.einsum(
                    "btf,fh->bth", dot_operand(qq * kk), dot_operand(pool),
                    preferred_element_type=jnp.float32,
                ) * scale

            # softmax over the 2 key speakers == sigmoid(score diff)
            w00 = jax.nn.sigmoid(head_scores(q0, k0) - head_scores(q0, k1))
            w11 = jax.nn.sigmoid(head_scores(q1, k1) - head_scores(q1, k0))
            # attention-prob dropout: each of the 4 prob maps is dropped
            # independently (same semantics as dropout on the [.., 2, 2]
            # attention matrix), without renormalization
            probs = jnp.stack([w00, 1.0 - w00, w11, 1.0 - w11])
            probs = nn.Dropout(self.dropout, deterministic=not train)(probs)

            def expand(w):  # [B, T, H] -> [B, T, F]
                return jnp.einsum(
                    "bth,fh->btf", w.astype(x.dtype), pool,
                    preferred_element_type=x.dtype,
                )

            out0 = expand(probs[0]) * v0 + expand(probs[1]) * v1
            out1 = expand(probs[2]) * v1 + expand(probs[3]) * v0
            out = jnp.stack([out0, out1], axis=1)
        else:
            qh = q.reshape(b, s, t, h, d)
            kh = k.reshape(b, s, t, h, d)
            vh = v.reshape(b, s, t, h, d)
            scores = jnp.einsum(
                "bpthd,bqthd->bpqth", dot_operand(qh), dot_operand(kh),
                preferred_element_type=jnp.float32,
            ) / math.sqrt(d)
            attn = jax.nn.softmax(
                scores.astype(jnp.float32), axis=2
            ).astype(x.dtype)
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            out = jnp.einsum(
                "bpqth,bqthd->bpthd", attn, vh, preferred_element_type=x.dtype
            ).reshape(b, s, t, f)
        out = TorchLinear(self.dim, name="out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return LayerScale(self.dim, self.layer_scale_init, name="layer_scale")(out)


class EGA(nn.Module):
    """Efficient Global Attention (network.py:126-155).

    Pools time down to the bottleneck length (= pos_k side), attends there,
    nearest-upsamples back, and gates into the residual stream:
    ``x + sigmoid(Linear(LN(x))) * up(attn(pool(x)))``.  Global attention
    cost is therefore constant across stage resolutions.
    """

    dim: int
    num_heads: int
    dropout: float
    norm_eps: float = 1.0e-5

    @nn.compact
    def __call__(self, x, pos: "RelPos", *, train: bool = False,
                 fused_tail: bool = False,
                 seq_lens: Optional[jnp.ndarray] = None):
        from sepreformer_tpu.ops.resample import (
            adaptive_avg_pool_time,
            nearest_upsample_time,
        )

        t = x.shape[1]
        down_len = pos.length
        x_down = adaptive_avg_pool_time(x, down_len)
        # masked exact-eval: the stage length is a multiple of
        # 2^(num_stages - s) (padded_frames pads L0 to a MULTIPLE of
        # 2^num_stages, not to a power of two), so the pool ratio
        # t // down_len is an exact integer and windows never straddle a
        # valid/pad boundary — a window is either fully valid (reads only
        # real frames) or fully pad (masked via key_lens below).  No
        # mask-weighted pooling needed.  If the padding policy or pool
        # ratio changes, this divisibility must be re-checked or weighted
        # pooling added.
        pooled_lens = (
            seq_lens // (t // down_len) if seq_lens is not None else None
        )
        x_down = MultiHeadAttention(
            self.dim, self.num_heads, self.dropout,
            norm_eps=self.norm_eps, name="attn",
        )(x_down, pos, train=train, key_lens=pooled_lens)
        gate_norm = TorchLayerNorm(self.dim, epsilon=self.norm_eps,
                                   name="gate_norm")
        gate_proj = TorchLinear(self.dim, in_features=self.dim,
                                name="gate_proj")
        if fused_tail:
            # hand (attention output, raw tail params) to GlobalBlock's
            # fused EGA-tail+GCFN kernel
            return x_down, (*gate_norm(return_params=True),
                            *gate_proj(return_params=True))
        x_up = nearest_upsample_time(x_down, t)
        gate = jax.nn.sigmoid(gate_proj(gate_norm(x)))
        return x + gate * x_up


class CLA(nn.Module):
    """Convolutional Local Attention (network.py:159-187).

    LN -> Linear(F->2F) -> GLU -> depthwise k65 same -> Linear(F->2F)
    -> BatchNorm -> GELU -> Linear(2F->F) -> drop, LayerScale residual.
    """

    dim: int
    kernel_size: int
    dropout: float
    layer_scale_init: float = 1.0e-5
    norm_eps: float = 1.0e-5
    fused: str = "auto"
    fused_depthwise: str = "auto"

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 seq_lens: Optional[jnp.ndarray] = None):
        norm = TorchLayerNorm(self.dim, epsilon=self.norm_eps, name="norm")
        proj_in = TorchLinear(self.dim * 2, in_features=self.dim,
                              name="proj_in")
        depthwise = DepthwiseConv1d(self.kernel_size, padding="SAME",
                                    features=self.dim, name="depthwise",
                                    fused=self.fused_depthwise)
        proj_mid = TorchLinear(self.dim * 2, in_features=self.dim,
                               name="proj_mid")
        bn = FoldableBatchNorm(self.dim * 2, momentum=0.9,
                               epsilon=self.norm_eps, name="bn")
        proj_out = TorchLinear(self.dim, in_features=self.dim * 2,
                               name="proj_out")
        layer_scale = LayerScale(self.dim, self.layer_scale_init,
                                 name="layer_scale")

        from sepreformer_tpu.ops.pallas.cla import fused_cla, pick_block

        # the fused kernel has eval semantics only: folded running-stats
        # BatchNorm, no dropout (eval never drops anyway).  "auto" resolves
        # to OFF: measured on v5e (B=4 x 4 s, f32) the fused block LOSES —
        # 27.96 vs 23.85 ms full-model forward — because the in-kernel k65
        # tap-loop conv is VPU-bound (~8 GFLOP at ~2 TF/s ~= 4 ms/model)
        # while XLA's depthwise lowering rides the MXU near SoL (~210 us
        # per full-res conv); the ~2 ms of HBM round-trips the fusion
        # saves cannot pay for that.  Kept behind "on"/"interpret" for
        # re-testing on other hardware.
        use_fused = (
            not train
            and self.fused in ("on", "interpret")
            and pick_block(x.shape[1], self.dim) > 0
            and seq_lens is None
        )
        if use_fused:
            lns, lnb = norm(return_params=True)
            w_in, b_in = proj_in(return_params=True)
            wdw, bdw = depthwise(return_params=True)
            w_mid, b_mid = proj_mid(return_params=True)
            bn_s, bn_t = bn(return_folded=True)
            w_out, b_out = proj_out(return_params=True)
            ls = layer_scale(return_params=True)
            params = (lns, lnb, w_in, b_in, wdw[:, 0, :], bdw, w_mid,
                      b_mid, bn_s, bn_t, w_out, b_out, ls)
            return fused_cla(x, params, self.norm_eps,
                             self.fused == "interpret")
        y = norm(x)
        y = proj_in(y)
        y = glu_last(y)
        if seq_lens is not None:
            # masked exact-eval: the k65 depthwise reads up to 32 frames
            # past the valid length — zero them to match the reference
            # conv's SAME zero-pad at true length
            y = y * length_mask(seq_lens, y.shape[1], y.dtype)
        y = depthwise(y)
        y = proj_mid(y)
        y = bn(y, use_running_average=not train).astype(x.dtype)
        y = gelu_exact(y)
        y = proj_out(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + layer_scale(y)


class GlobalBlock(nn.Module):
    """EGA + GCFN (network.py:189-209).

    On TPU the EGA tail (gate -> nearest-upsample -> residual) and the
    GCFN are fused into one Pallas kernel (ops/pallas/ega_gcfn.py): the
    tail is pure elementwise + one [F, F] matmul but costs three
    full-resolution HBM round-trips under XLA.  The fused pair is used
    for deterministic passes (no GCFN dropout in-kernel); training with
    dropout > 0 keeps the separate EGA + fused-train-GCFN path.
    """

    dim: int
    num_heads: int
    dropout: float
    norm_eps: float = 1.0e-5
    fused_ffn: str = "auto"
    fused_pair: str = "auto"

    @nn.compact
    def __call__(self, x, pos, *, train: bool = False,
                 seq_lens: Optional[jnp.ndarray] = None):
        ega = EGA(self.dim, self.num_heads, self.dropout,
                  norm_eps=self.norm_eps, name="ega")
        gcfn = GCFN(self.dim, self.dropout, norm_eps=self.norm_eps,
                    fused=self.fused_ffn, name="gcfn")

        from sepreformer_tpu.ops.pallas.ega_gcfn import fused_ega_tail_gcfn
        from sepreformer_tpu.ops.pallas.gcfn import pick_block

        pair_ok = (
            pick_block(x.shape[1]) > 0
            and not (train and self.dropout > 0.0)
            and seq_lens is None
        )
        # "auto" resolves to OFF: measured on v5e, the pair kernel loses
        # to XLA's own tail fusion at both Base (23.9 vs 23.4 ms) and
        # Large (25.7 vs 23.5 ms) — streaming the upsampled tensor through
        # the kernel costs more than the gate round-trips it saves, and
        # the earlier in-kernel-upsample formulation cost even more (see
        # ops/pallas/ega_gcfn.py docstring).  Kept behind "on" for
        # re-testing on other hardware/XLA versions.
        use_pair = pair_ok and self.fused_pair in ("on", "interpret")
        if use_pair:
            x_down, gate_params = ega(x, pos, train=train, fused_tail=True)
            gcfn_params = gcfn(return_params=True)
            return fused_ega_tail_gcfn(
                x, x_down, gate_params, gcfn_params, self.norm_eps,
                self.fused_pair == "interpret",
            )
        x = ega(x, pos, train=train, seq_lens=seq_lens)
        return gcfn(x, train=train, seq_lens=seq_lens)


class LocalBlock(nn.Module):
    """CLA + GCFN (network.py:212-224)."""

    dim: int
    kernel_size: int
    dropout: float
    norm_eps: float = 1.0e-5
    fused_ffn: str = "auto"
    fused_local: str = "auto"
    fused_depthwise: str = "auto"

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 seq_lens: Optional[jnp.ndarray] = None):
        x = CLA(self.dim, self.kernel_size, self.dropout,
                norm_eps=self.norm_eps, fused=self.fused_local,
                fused_depthwise=self.fused_depthwise,
                name="cla")(x, train=train, seq_lens=seq_lens)
        return GCFN(self.dim, self.dropout, norm_eps=self.norm_eps,
                    fused=self.fused_ffn, name="gcfn")(x, train=train,
                                                       seq_lens=seq_lens)


class SpkAttention(nn.Module):
    """Cross-speaker transformer (network.py:227-252).

    Attention over the speaker axis (seq len = num_spks): reshape
    [B*spks, T, F] -> [B*T, spks, F], residual MHA, reshape back, GCFN.
    """

    dim: int
    num_heads: int
    num_spks: int
    dropout: float
    norm_eps: float = 1.0e-5
    fused_ffn: str = "auto"

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 seq_lens: Optional[jnp.ndarray] = None):
        bs, t, f = x.shape
        b = bs // self.num_spks
        # transpose-free: [B*S, T, F] -> [B, S, T, F] is a pure reshape;
        # MHA's speaker-axis mode attends over S batched on (B, T) —
        # per-position over speakers, so no time mask is needed there
        y = x.reshape(b, self.num_spks, t, f)
        y = y + MultiHeadAttention(
            self.dim, self.num_heads, self.dropout,
            norm_eps=self.norm_eps, name="attn",
        )(y, None, train=train)
        y = y.reshape(bs, t, f)
        return GCFN(self.dim, self.dropout, norm_eps=self.norm_eps,
                    fused=self.fused_ffn, name="gcfn")(y, train=train,
                                                       seq_lens=seq_lens)


class DownConvLayer(nn.Module):
    """Depthwise k5 stride-2 downsampling + BatchNorm + GELU
    (module.py:66-83).  Halves the time axis."""

    dim: int
    kernel_size: int = 5
    norm_eps: float = 1.0e-5

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 seq_lens: Optional[jnp.ndarray] = None):
        if seq_lens is not None:
            # masked exact-eval: the k5 stride-2 conv's last valid output
            # reads 1 frame past the valid length — make it the zero the
            # reference's boundary pad supplies at true length
            x = x * length_mask(seq_lens, x.shape[1], x.dtype)
        y = DepthwiseConv1d(
            self.kernel_size, stride=2,
            padding=(self.kernel_size - 1) // 2, name="conv",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            epsilon=self.norm_eps, name="bn",
        )(y).astype(x.dtype)
        return gelu_exact(y)


class SpkSplitStage(nn.Module):
    """Early speaker split in the latent (module.py:110-125).

    1x1 conv F->4F*spks, GLU over channels, 1x1 conv -> F*spks, reshape
    [B, T, spks*F] -> [B*spks, T, F] (speaker-major channel blocks, matching
    the reference's view(B*spks, F, T)), then GroupNorm(1, F, eps=1e-8).
    """

    dim: int
    num_spks: int
    group_norm_eps: float = 1.0e-8

    @nn.compact
    def __call__(self, x, seq_lens: Optional[jnp.ndarray] = None):
        b, t, f = x.shape
        y = TorchLinear(4 * self.dim * self.num_spks, name="proj_in")(x)
        y = glu_last(y)
        y = TorchLinear(self.dim * self.num_spks, name="proj_out")(y)
        y = y.reshape(b, t, self.num_spks, self.dim)
        y = y.transpose(0, 2, 1, 3).reshape(b * self.num_spks, t, self.dim)
        mask = None
        if seq_lens is not None:
            # masked exact-eval: GroupNorm(1, F) statistics span (T, F) —
            # restrict them to the utterance's true-length frames.  Rows
            # repeat per speaker after the split reshape above.
            mask = jnp.broadcast_to(
                length_mask(jnp.repeat(seq_lens, self.num_spks), t)
                .astype(bool),
                y.shape,
            )  # flax reshapes the mask into groups with y: needs full shape
        return nn.GroupNorm(
            num_groups=1, epsilon=self.group_norm_eps, name="norm"
        )(y, mask=mask).astype(x.dtype)
