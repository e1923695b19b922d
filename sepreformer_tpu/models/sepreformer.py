"""SepReformer model: asymmetric encoder-decoder separator, parameterized.

One implementation covers every reference variant (the reference keeps four
~95%-identical clones under ``models/<VARIANT>/``; see SURVEY.md §2.8).
Variant deltas are config knobs: ``feat_dim``, ``dropout``,
``per_stage_spk_split``.

Pipeline (ref: model.py:38-52, module.py:190-218):

  waveform [B, T]
    -> AudioEncoder      conv k16 s4 + GELU        -> [B, T', N]
    -> FeatureProjector  GroupNorm + 1x1            -> [B, T', F]
    -> Separator         U-Net: R contracting stages (2x(Global,Local) +
                         down-conv /2), bottleneck stage, early speaker
                         split, R expanding stages (upsample + skip fusion +
                         3x(Global,Local,SpkAttention))
    -> OutputLayer       MLP F->N (mask-free final head)
    -> AudioDecoder      transposed conv k16 s4 (overlap-add) per speaker
  plus per-stage aux heads (masking OutputLayer + decoder) for the
  progressive multi-scale losses.

All time lengths are static under jit; eval uses length bucketing.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sepreformer_tpu.config import ModelConfig
from sepreformer_tpu.models.blocks import (
    CLA,
    DownConvLayer,
    GlobalBlock,
    LocalBlock,
    SpkAttention,
    SpkSplitStage,
    TorchLinear,
    gelu_exact,
    glu_last,
    torch_uniform_init,
)
from sepreformer_tpu.ops.framing import decoder_overlap_add, encoder_conv
from sepreformer_tpu.ops.resample import nearest_upsample_time


class AudioEncoder(nn.Module):
    """Learnable front-end: Conv1d(1->N, k, stride, bias=False) + GELU
    (module.py:12-23), implemented as polyphase framing + matmul."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        kernel = self.param(
            "kernel", torch_uniform_init(cfg.enc_kernel),
            (cfg.enc_kernel, cfg.enc_dim),
        )
        return gelu_exact(encoder_conv(x, kernel.astype(x.dtype), cfg.enc_stride))


class FeatureProjector(nn.Module):
    """GroupNorm(1, N, eps=1e-8) + 1x1 conv N->F bias-free (module.py:25-35)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, frame_lens=None):
        cfg = self.cfg
        mask = None
        if frame_lens is not None:
            # masked exact-eval: the reference normalizes over the
            # UNPADDED (T', N) — pad_signal runs later, inside the
            # separator (module.py:190-194 vs 220-234)
            from sepreformer_tpu.models.blocks import length_mask

            # flax GroupNorm reshapes the mask alongside x into groups, so
            # it must be materialized at x's full shape
            mask = jnp.broadcast_to(
                length_mask(frame_lens, x.shape[1]).astype(bool), x.shape
            )
        y = nn.GroupNorm(
            num_groups=1, epsilon=cfg.group_norm_eps, name="norm"
        )(x, mask=mask).astype(x.dtype)
        return TorchLinear(cfg.feat_dim, use_bias=False, name="proj")(y)


class RelativePositionalEncoding(nn.Module):
    """Rel-pos key table Embedding(2*maxlen, F/heads) (module.py:42-57).

    The index matrix is built once at the bottleneck length and the same
    RelPos context is shared by every global block at every scale (module.py:196-198).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, length: int):
        from sepreformer_tpu.models.blocks import RelPos

        cfg = self.cfg
        table = self.param(
            "pe_k", nn.initializers.normal(1.0),
            (2 * cfg.pos_maxlen, cfg.head_dim),
        )
        if cfg.embed_v:
            # faithful embed_v semantics: the reference CREATES pe_v
            # (module.py:50) and computes its gather (module.py:56), but
            # the attention math never consumes it — MHA takes pos_k only
            # (network.py:90-113).  So embed_v=True means "the parameter
            # exists and converts 1:1 with reference checkpoints", nothing
            # more.  No shipped variant enables it.
            self.param(
                "pe_v", nn.initializers.normal(1.0),
                (2 * cfg.pos_maxlen, cfg.head_dim),
            )
        # materialize the gathered (and pre-transposed, see RelPos
        # docstring) table once for the XLA attention path so its backward
        # does one scatter-add instead of one per block; the flash-kernel
        # path consumes the raw table (no [L, L, d] tensor)
        from sepreformer_tpu.models.blocks import (
            gather_pos_kt,
            relpos_store_dtype,
            resolve_attention_impl,
        )

        pos_kt = None
        resolved = resolve_attention_impl(cfg.attention_impl, length)
        if (length > 0
                and resolved in ("xla", "fused_pv", "fused_pv_interpret")):
            from sepreformer_tpu.ops.pallas.relpos import (
                materialize_pos_kt,
                resolve_relpos_materializer,
            )

            # fused_pv pads attention to a 128-aligned length (DMA
            # tiling); share the pos_kt at that padded length
            mat_len = (((length + 127) // 128) * 128
                       if resolved.startswith("fused_pv") else length)
            mat = resolve_relpos_materializer(cfg.relpos_materializer)
            if mat in ("pallas", "pallas_interpret"):
                # layout-pinned Pallas generator: kills the per-consumer
                # relayout copies of the gather's d-minor layout
                # (ops/pallas/relpos.py, ARCHITECTURE.md profile)
                pos_kt = materialize_pos_kt(
                    table, mat_len, cfg.pos_maxlen,
                    mat == "pallas_interpret",
                )
            else:
                pos_kt = gather_pos_kt(table, mat_len, cfg.pos_maxlen)
            pos_kt = pos_kt.astype(relpos_store_dtype(cfg.relpos_dtype))
            if cfg.relpos_barrier == "on":
                # freeze the materialization: without the barrier XLA
                # re-fuses the gather into every consuming bias dot and
                # each pays its own relayout copy (ARCHITECTURE.md)
                import jax

                pos_kt = jax.lax.optimization_barrier(pos_kt)
        return RelPos(
            table=table, length=length, maxlen=cfg.pos_maxlen,
            impl=cfg.attention_impl, pos_kt=pos_kt,
            train_impl=cfg.attention_train_impl,
            scores_dtype=cfg.scores_dtype,
        )


class SepEncStage(nn.Module):
    """Contracting stage: 2x(GlobalBlock -> LocalBlock), optional down-conv
    halving time (module.py:59-108).  Returns (downsampled x, pre-down skip)."""

    cfg: ModelConfig
    down_conv: bool = True

    @nn.compact
    def __call__(self, x, pos, *, train: bool = False, seq_lens=None):
        cfg = self.cfg
        for i in (1, 2):
            x = GlobalBlock(
                cfg.feat_dim, cfg.num_heads, cfg.dropout,
                norm_eps=cfg.norm_eps, fused_ffn=cfg.fused_ffn,
                fused_pair=cfg.fused_pair, name=f"global_{i}",
            )(x, pos, train=train, seq_lens=seq_lens)
            x = LocalBlock(
                cfg.feat_dim, cfg.local_kernel, cfg.dropout,
                norm_eps=cfg.norm_eps, fused_ffn=cfg.fused_ffn,
                fused_local=cfg.fused_local,
                fused_depthwise=cfg.fused_depthwise, name=f"local_{i}",
            )(x, train=train, seq_lens=seq_lens)
        skip = x
        if self.down_conv:
            x = DownConvLayer(
                cfg.feat_dim, cfg.down_kernel, norm_eps=cfg.norm_eps, name="down",
            )(x, train=train, seq_lens=seq_lens)
        return x, skip


class SepDecStage(nn.Module):
    """Reconstruction-decoder stage: 3x(Global -> Local -> SpkAttention)
    (module.py:127-170)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, pos, *, train: bool = False, seq_lens=None):
        cfg = self.cfg
        for i in (1, 2, 3):
            x = GlobalBlock(
                cfg.feat_dim, cfg.num_heads, cfg.dropout,
                norm_eps=cfg.norm_eps, fused_ffn=cfg.fused_ffn,
                fused_pair=cfg.fused_pair, name=f"global_{i}",
            )(x, pos, train=train, seq_lens=seq_lens)
            x = LocalBlock(
                cfg.feat_dim, cfg.local_kernel, cfg.dropout,
                norm_eps=cfg.norm_eps, fused_ffn=cfg.fused_ffn,
                fused_local=cfg.fused_local,
                fused_depthwise=cfg.fused_depthwise, name=f"local_{i}",
            )(x, train=train, seq_lens=seq_lens)
            x = SpkAttention(
                cfg.feat_dim, cfg.num_heads, cfg.num_spks, cfg.dropout,
                norm_eps=cfg.norm_eps, fused_ffn=cfg.fused_ffn,
                name=f"spk_attn_{i}",
            )(x, train=train, seq_lens=seq_lens)
        return x


class Separator(nn.Module):
    """U-Net-style separator with early speaker split (module.py:38-234)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, *, train: bool = False, frame_lens=None):
        cfg = self.cfg
        t_in = x.shape[1]
        t_pad = cfg.padded_frames(t_in)
        if t_pad > t_in:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t_in), (0, 0)))
        bottleneck_len = t_pad // (2 ** cfg.num_stages)
        pos = RelativePositionalEncoding(cfg, name="pos_emb")(bottleneck_len)

        # masked exact-eval: each utterance's in-separator valid length is
        # its own pad_signal result (frames rounded up to 2^R,
        # module.py:220-234); positions in [n0, t1) are the reference's
        # real zero-pad frames (processed normally), positions >= t1 are
        # bucket padding made invisible via seq_lens threading.
        mult = 2 ** cfg.num_stages
        t1 = (
            ((frame_lens + mult - 1) // mult) * mult
            if frame_lens is not None else None
        )

        def lens_at(scale: int, spk: bool):
            """Valid frames at time scale 1/2^scale (optionally per-spk rows)."""
            if t1 is None:
                return None
            lens = t1 // (2 ** scale)
            return jnp.repeat(lens, cfg.num_spks) if spk else lens

        def spk_split(name):
            return SpkSplitStage(
                cfg.feat_dim, cfg.num_spks,
                group_norm_eps=cfg.group_norm_eps, name=name,
            )

        # Large_DM_WHAM uses independent SpkSplit blocks per stage
        # (its modules/module.py:181-184); other variants share one.
        if cfg.per_stage_spk_split:
            split_for = lambda idx: spk_split(f"spk_split_{idx}")
        else:
            shared = spk_split("spk_split")
            split_for = lambda idx: shared

        skips = []
        for s in range(cfg.num_stages):
            x, skip = SepEncStage(cfg, down_conv=True, name=f"enc_{s}")(
                x, pos, train=train, seq_lens=lens_at(s, spk=False)
            )
            skips.append(split_for(s)(skip, lens_at(s, spk=False)))
        x, _ = SepEncStage(cfg, down_conv=False, name="bottleneck")(
            x, pos, train=train, seq_lens=lens_at(cfg.num_stages, spk=False)
        )
        x = split_for(cfg.num_stages)(x, lens_at(cfg.num_stages, spk=False))

        stage_outputs = []
        for s in range(cfg.num_stages):
            stage_outputs.append(x)
            skip = skips[cfg.num_stages - 1 - s]
            x = nearest_upsample_time(x, skip.shape[1])
            x = jnp.concatenate([x, skip], axis=-1)
            x = TorchLinear(cfg.feat_dim, name=f"fusion_{s}")(x)
            x = SepDecStage(cfg, name=f"dec_{s}")(
                x, pos, train=train,
                seq_lens=lens_at(cfg.num_stages - 1 - s, spk=True),
            )
        return x, stage_outputs


class OutputLayer(nn.Module):
    """Feature expansion back to encoder space (module.py:237-265).

    Truncates to the encoder frame length, applies
    Linear(F->4F)+GLU+Linear(2F->N); the aux heads (masking=True) gate the
    broadcast encoder output with a ReLU mask (network.py:20-43), the final
    head maps directly.  Returns [spks, B, T', N].
    """

    cfg: ModelConfig
    masking: bool = False

    @nn.compact
    def __call__(self, x, enc_out):
        cfg = self.cfg
        t_enc = enc_out.shape[1]
        x = x[:, :t_enc]
        y = TorchLinear(4 * cfg.feat_dim, name="proj_in")(x)
        y = glu_last(y)
        y = TorchLinear(cfg.enc_dim, name="proj_out")(y)
        bs = y.shape[0]
        b = bs // cfg.num_spks
        if self.masking:
            tiled = jnp.repeat(enc_out, cfg.num_spks, axis=0)  # [B*spks, T', N]
            y = jax.nn.relu(y) * tiled
        y = y.reshape(b, cfg.num_spks, t_enc, cfg.enc_dim)
        return y.transpose(1, 0, 2, 3)  # [spks, B, T', N]


class AudioDecoder(nn.Module):
    """ConvTranspose1d(N->1, k, stride, bias=False) overlap-add synthesis
    (module.py:268-283), implemented as matmul + polyphase OLA."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, h):
        cfg = self.cfg
        kernel = self.param(
            "kernel", torch_uniform_init(cfg.enc_kernel),
            (cfg.enc_dim, cfg.enc_kernel),
        )
        return decoder_overlap_add(h, kernel.astype(h.dtype), cfg.enc_stride)


class SepReformer(nn.Module):
    """Full model with per-stage aux heads (model.py:13-52).

    ``__call__(x)`` with x: [B, T] (T % enc_stride == 0) returns
    ``(audio, aux)`` where audio: [spks, B, T] final separated waveforms and
    aux: [num_stages, spks, B, T] per-stage auxiliary reconstructions
    (coarsest stage first), matching the reference's return structure.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, *, train: bool = False, lengths=None):
        cfg = self.cfg
        t_samples = x.shape[-1]
        x = x.astype(jnp.dtype(cfg.compute_dtype))
        enc = AudioEncoder(cfg, name="audio_encoder")(x)

        # masked exact-eval: with per-utterance true sample counts, padded
        # positions become invisible to every length-sensitive op, so
        # audio[:, b, :lengths[b]] equals the reference's true-length
        # batch-1 output regardless of bucket/batch padding.  (The aux
        # heads are NOT masked — their per-utterance upsample ratio is
        # non-integral, and they only feed the training losses, which run
        # on unpadded max_len crops.)
        enc_mask = frame_lens = None
        if lengths is not None:
            frame_lens = jnp.maximum(
                (jnp.asarray(lengths, jnp.int32) - cfg.enc_kernel)
                // cfg.enc_stride + 1,
                1,
            )
            from sepreformer_tpu.models.blocks import length_mask

            # frames past n0 read bucket-pad samples through the encoder
            # conv's tail overlap — zero them to match the reference's
            # frame-level zero pad (module.py:220-234)
            enc_mask = length_mask(frame_lens, enc.shape[1], enc.dtype)
            enc = enc * enc_mask
        proj = FeatureProjector(cfg, name="feature_projector")(
            enc, frame_lens
        )
        if enc_mask is not None:
            # the masked GroupNorm output at zeroed pad frames is
            # (0-mean)/sigma*gamma+beta != 0; the reference's separator
            # input pad is exact zeros
            proj = proj * enc_mask
        last, stage_outs = Separator(cfg, name="separator")(
            proj, train=train, frame_lens=frame_lens
        )

        out = OutputLayer(cfg, masking=False, name="out_layer")(last, enc)
        if enc_mask is not None:
            # the final head's biases make pad frames nonzero, and frame
            # n0's overlap-add window reaches back into valid samples
            out = out * enc_mask[None]
        decoder = AudioDecoder(cfg, name="audio_decoder")
        audio = jnp.stack(
            [decoder(out[i])[..., :t_samples] for i in range(cfg.num_spks)]
        )

        t_enc = enc.shape[1]
        aux = []
        for idx, so in enumerate(stage_outs):
            up = nearest_upsample_time(so, t_enc)
            o = OutputLayer(cfg, masking=True, name=f"aux_out_layer_{idx}")(up, enc)
            dec = AudioDecoder(cfg, name=f"aux_decoder_{idx}")
            aux.append(
                jnp.stack(
                    [dec(o[j])[..., :t_samples] for j in range(cfg.num_spks)]
                )
            )
        # losses/metrics always run in f32 regardless of compute dtype
        return audio.astype(jnp.float32), jnp.stack(aux).astype(jnp.float32)
