"""Key-masked kernel equivalence: flash attention / single-block
attention / fused GCFN vs their XLA masked references.

These cover VERDICT r2 item 7: masked batched eval (bucket padding,
``eval_batch_size > 1``) keeps the Pallas kernels instead of falling back
to dense XLA.  Interpreter mode on CPU; the on-chip evidence is
MEASURE_MASKED_EVAL.json (measure_masked_eval.py): a bucket-padded batch
through the REAL masked kernels reproduces each utterance's solo forward
at >= 48.4 dB SI-SNR, with the masked batched-eval throughput table at
eval_batch_size in {1, 4, 8}.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sepreformer_tpu.ops.pallas.attention import (
    _flash_relpos_attention_impl,
    relpos_attention_reference,
)
from sepreformer_tpu.ops.pallas.attention_train import (
    _fwd_impl as single_fwd_impl,
)
from sepreformer_tpu.ops.pallas.attention_train import (
    attention_train_reference,
)
from sepreformer_tpu.ops.pallas.gcfn import (
    _fused_gcfn_impl,
    gcfn_reference,
)


def _rand_qkvpe(rng, b=4, h=2, l=200, d=16, maxlen=256):
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(2 * maxlen, d)), jnp.float32)
    return q, k, v, pe


def _compare_valid_rows(out, ref, lens, rtol=2e-5, atol=2e-5):
    """Rows at positions >= lens[b] are downstream-masked garbage in both
    implementations; compare only the valid query rows."""
    out, ref = np.asarray(out), np.asarray(ref)
    for b in range(out.shape[0]):
        t = int(lens[b])
        np.testing.assert_allclose(out[b, :, :t], ref[b, :, :t],
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("l", [200, 500])
def test_flash_masked_matches_reference(rng, l):
    q, k, v, pe = _rand_qkvpe(rng, l=l, maxlen=512)
    lens = jnp.asarray([l, l - 7, l // 2, 5], jnp.int32)
    out = _flash_relpos_attention_impl(q, k, v, pe, 512, interpret=True,
                                       lens=lens)
    ref = relpos_attention_reference(q, k, v, pe, 512, lens=lens)
    _compare_valid_rows(out, ref, lens)


def test_flash_masked_multiblock(rng):
    """Online-softmax multi-block path with per-row masks crossing block
    boundaries."""
    q, k, v, pe = _rand_qkvpe(rng, l=400, maxlen=512)
    lens = jnp.asarray([400, 300, 129, 127], jnp.int32)
    out = _flash_relpos_attention_impl(q, k, v, pe, 512, interpret=True,
                                       block=128, lens=lens)
    ref = relpos_attention_reference(q, k, v, pe, 512, lens=lens)
    _compare_valid_rows(out, ref, lens)


def test_flash_full_lens_equals_unmasked(rng):
    """lens == L must be bit-identical to passing no mask."""
    q, k, v, pe = _rand_qkvpe(rng, l=200, maxlen=256)
    lens = jnp.full((4,), 200, jnp.int32)
    out_m = _flash_relpos_attention_impl(q, k, v, pe, 256, interpret=True,
                                         lens=lens)
    out = _flash_relpos_attention_impl(q, k, v, pe, 256, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(out))


def test_single_masked_matches_reference(rng):
    """The single-block train kernel's forward (attention_impl="single")
    with key masks — the masked-batched-eval serving path."""
    q, k, v, pe = _rand_qkvpe(rng, l=300, maxlen=512)
    lens = jnp.asarray([300, 250, 128, 3], jnp.int32)
    out = single_fwd_impl(q, k, v, pe, jnp.int32(0), 512, 0.0, True,
                          lens=lens)
    ref = attention_train_reference(q, k, v, pe, 512, jnp.int32(0), 0.0,
                                    lens=lens)
    _compare_valid_rows(out, ref, lens)


def test_gcfn_masked_matches_reference(rng):
    from sepreformer_tpu.models.blocks import length_mask

    b, t, f, hidden = 3, 256, 32, 96
    x = jnp.asarray(rng.normal(size=(b, t, f)), jnp.float32)
    params = (
        jnp.asarray(rng.normal(size=(f,)), jnp.float32),       # ln scale
        jnp.asarray(rng.normal(size=(f,)), jnp.float32),       # ln bias
        jnp.asarray(rng.normal(size=(f, hidden)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(hidden,)), jnp.float32),
        jnp.asarray(rng.normal(size=(3, hidden)), jnp.float32),
        jnp.asarray(rng.normal(size=(hidden,)), jnp.float32),
        jnp.asarray(rng.normal(size=(hidden // 2, f)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(f,)), jnp.float32),
        jnp.asarray(rng.normal(size=(f,)) * 1e-2, jnp.float32),
    )
    lens = jnp.asarray([256, 200, 65], jnp.int32)
    mask = length_mask(lens, t, jnp.float32)
    out = _fused_gcfn_impl(x, params, 1e-5, interpret=True, mask=mask)
    ref = gcfn_reference(x, params, 1e-5, mask)
    # all rows comparable: GCFN's residual keeps padded rows = x + ls*f(0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gcfn_blocked_masked_matches_reference(rng):
    """Mask boundary inside a middle block + at a block edge (the halo
    rows carry the mask across block boundaries)."""
    from sepreformer_tpu.models.blocks import length_mask
    from sepreformer_tpu.ops.pallas import gcfn as gcfn_mod

    b, t, f, hidden = 2, 1024, 32, 96
    x = jnp.asarray(rng.normal(size=(b, t, f)), jnp.float32)
    rngs = np.random.default_rng(7)
    params = (
        jnp.asarray(rngs.normal(size=(f,)), jnp.float32),
        jnp.asarray(rngs.normal(size=(f,)), jnp.float32),
        jnp.asarray(rngs.normal(size=(f, hidden)) * 0.1, jnp.float32),
        jnp.asarray(rngs.normal(size=(hidden,)), jnp.float32),
        jnp.asarray(rngs.normal(size=(3, hidden)), jnp.float32),
        jnp.asarray(rngs.normal(size=(hidden,)), jnp.float32),
        jnp.asarray(rngs.normal(size=(hidden // 2, f)) * 0.1, jnp.float32),
        jnp.asarray(rngs.normal(size=(f,)), jnp.float32),
        jnp.asarray(rngs.normal(size=(f,)) * 1e-2, jnp.float32),
    )
    assert gcfn_mod.pick_block(t) < t, "test requires a multi-block layout"
    lens = jnp.asarray([777, 512], jnp.int32)  # mid-block + exact edge
    mask = length_mask(lens, t, jnp.float32)
    out = _fused_gcfn_impl(x, params, 1e-5, interpret=True, mask=mask)
    ref = gcfn_reference(x, params, 1e-5, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mha_module_masked_pallas_vs_xla(rng):
    """MultiHeadAttention end-to-end: forced-pallas masked eval equals the
    XLA masked path (the engine-level identity test covers the full
    model; this isolates the attention module)."""
    import dataclasses

    import flax.linen as nn

    from sepreformer_tpu.config import ModelConfig
    from sepreformer_tpu.models.blocks import MultiHeadAttention
    from sepreformer_tpu.models.sepreformer import (
        RelativePositionalEncoding,
    )

    b, t, f, h = 3, 160, 32, 4
    x = jnp.asarray(rng.normal(size=(b, t, f)), jnp.float32)
    lens = jnp.asarray([160, 100, 33], jnp.int32)

    def run(impl):
        cfg = ModelConfig(feat_dim=f, num_heads=h, pos_maxlen=256,
                          attention_impl=impl, attention_train_impl="xla",
                          dropout=0.0)

        class Wrap(nn.Module):
            @nn.compact
            def __call__(self, x, lens):
                pos = RelativePositionalEncoding(cfg, name="pos")(x.shape[1])
                return MultiHeadAttention(
                    dim=f, num_heads=h, dropout=0.0, name="mha"
                )(x, pos, train=False, key_lens=lens)

        m = Wrap()
        vs = m.init(jax.random.key(0), x, lens)
        return m.apply(vs, x, lens)

    out_x = run("xla")
    out_p = run("pallas_interpret")
    out_s = run("single_interpret")
    _compare_valid_rows(
        np.transpose(np.asarray(out_x), (0, 2, 1)),
        np.transpose(np.asarray(out_p), (0, 2, 1)), lens,
        rtol=3e-5, atol=3e-5,
    )
    _compare_valid_rows(
        np.transpose(np.asarray(out_x), (0, 2, 1)),
        np.transpose(np.asarray(out_s), (0, 2, 1)), lens,
        rtol=3e-5, atol=3e-5,
    )
