"""Chunked overlap-add long-form separation tests."""

import numpy as np

import jax
import jax.numpy as jnp

from sepreformer_tpu.serving import (
    align_permutation,
    chunk_starts,
    separate_chunked,
)


def test_chunk_starts_cover_everything():
    for total, c, h in [(100, 40, 20), (100, 40, 40), (35, 40, 20),
                        (41, 40, 20), (8000, 1024, 512)]:
        starts = chunk_starts(total, c, h)
        covered = np.zeros(total, bool)
        for s in starts:
            covered[s:s + c] = True
        assert covered.all()
        assert starts == sorted(starts)
        # consecutive chunks overlap (or butt) so alignment has signal
        for a, b in zip(starts, starts[1:]):
            assert b - a <= c


def test_align_permutation_identity_and_swap(rng):
    a = rng.normal(size=(2, 50)).astype(np.float32)
    assert align_permutation(a, a) == (0, 1)
    assert align_permutation(a, a[::-1]) == (1, 0)


def test_align_permutation_three_speakers(rng):
    a = rng.normal(size=(3, 64)).astype(np.float32)
    perm = (2, 0, 1)
    shuffled = a[list(perm)]
    got = align_permutation(a, shuffled)
    assert tuple(shuffled[list(got)].flatten()) == tuple(a.flatten())


def _oracle_forward(swap_rule):
    """Deterministic linear 'separator': spk0 = 0.7x, spk1 = -0.3x, with a
    per-chunk speaker swap decided by ``swap_rule(chunk_contents)`` —
    models the per-forward permutation ambiguity of a real separator."""
    calls = {"n": 0}

    def forward(batch):
        out = np.stack([0.7 * batch, -0.3 * batch], axis=1)
        for i in range(batch.shape[0]):
            if swap_rule(calls["n"] + i):
                out[i] = out[i, ::-1]
        calls["n"] += batch.shape[0]
        return out

    return forward


def test_stitch_exact_with_consistent_chunks(rng):
    """A chunk-consistent separator must stitch to the exact full answer
    regardless of how each chunk permutes its speakers."""
    wav = rng.normal(size=(10_000,)).astype(np.float32)
    for rule in (lambda i: False, lambda i: True, lambda i: i % 2 == 0,
                 lambda i: (i * 2654435761) % 3 == 0):
        est = separate_chunked(_oracle_forward(rule), wav, chunk_len=2048,
                               hop=1024, batch_size=3)
        assert est.shape == (2, 10_000)
        # global speaker order is set by chunk 0 (inherently ambiguous);
        # the guarantee is CONSISTENCY: each stitched stream must equal one
        # oracle source exactly, with no chunk-boundary leakage
        if rule(0):  # chunk 0 swapped -> global order swapped
            est = est[::-1]
        np.testing.assert_allclose(est[0], 0.7 * wav, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(est[1], -0.3 * wav, rtol=1e-5, atol=1e-5)


def test_short_input_single_chunk(rng):
    wav = rng.normal(size=(500,)).astype(np.float32)
    est = separate_chunked(_oracle_forward(lambda i: False), wav,
                           chunk_len=2048)
    assert est.shape == (2, 500)
    np.testing.assert_allclose(est[0], 0.7 * wav, rtol=1e-5, atol=1e-5)


def test_chunked_with_real_tiny_model(rng):
    from sepreformer_tpu.models import SepReformer
    from test_model import tiny_cfg

    cfg = tiny_cfg()
    model = SepReformer(cfg)
    x_init = jnp.zeros((1, 800), jnp.float32)
    variables = model.init(jax.random.key(0), x_init)

    @jax.jit
    def forward(batch):
        audio, _ = model.apply(variables, batch)
        return jnp.transpose(audio, (1, 0, 2))  # [spks,B,T] -> [B,spks,T]

    wav = rng.normal(scale=0.1, size=(4000,)).astype(np.float32)
    est = separate_chunked(forward, wav, chunk_len=1600, hop=800)
    assert est.shape == (2, 4000)
    assert np.isfinite(est).all()

    # chunk_len >= T degenerates to one full forward
    est_full = separate_chunked(forward, wav, chunk_len=4800)
    direct = np.asarray(forward(np.pad(wav, (0, 800))[None]))[0, :, :4000]
    np.testing.assert_allclose(est_full, direct, rtol=1e-5, atol=1e-6)
