"""bf16 dot paths inside the fused Pallas kernels.

For bf16 streams the kernels run MXU matmuls with bf16 operands and f32
accumulation (native MXU mode); these tests check the bf16 kernels stay
within bf16 tolerance of the f32 references (interpret mode on CPU).
"""

import numpy as np

import jax
import jax.numpy as jnp

from sepreformer_tpu.ops.pallas.attention import (
    _flash_relpos_attention_impl,
    relpos_attention_reference,
)
from sepreformer_tpu.ops.pallas.gcfn import (
    _fused_gcfn_impl,
    gcfn_reference,
    matmul_dtype,
)
from sepreformer_tpu.ops.pallas.gcfn_train import (
    _bwd_train_impl,
    _fwd_train_impl,
    gcfn_train_reference,
)

from test_pallas_gcfn import _params


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12)


def test_matmul_dtype_policy():
    assert matmul_dtype(jnp.bfloat16) == jnp.bfloat16
    assert matmul_dtype(jnp.float32) == jnp.float32


def test_fused_gcfn_bf16_close_to_f32_reference(rng):
    x32 = jnp.asarray(rng.normal(size=(2, 256, 64)), jnp.float32)
    params = _params(rng, f=64)
    ref = gcfn_reference(x32, params, 1e-5)
    out = _fused_gcfn_impl(x32.astype(jnp.bfloat16), params, 1e-5,
                           interpret=True)
    assert out.dtype == jnp.bfloat16
    # bf16 has ~3 significant digits; residual output scale is O(|x|)
    assert _rel_err(out.astype(jnp.float32), ref) < 3e-2


def test_fused_gcfn_train_bf16_fwd_and_bwd(rng):
    x32 = jnp.asarray(rng.normal(size=(1, 256, 64)), jnp.float32)
    params = _params(rng, f=64)
    seed = jnp.int32(1234)
    p = 0.1
    ref = gcfn_train_reference(x32, params, 1e-5, seed, p)
    out = _fwd_train_impl(x32.astype(jnp.bfloat16), params, seed, 1e-5, p,
                          interpret=True)
    assert out.dtype == jnp.bfloat16
    assert _rel_err(out.astype(jnp.float32), ref) < 3e-2

    dout = jnp.asarray(rng.normal(size=x32.shape), jnp.float32)
    _, vjp = jax.vjp(
        lambda x, pr: gcfn_train_reference(x, pr, 1e-5, seed, p), x32, params
    )
    dx_ref, dp_ref = vjp(dout)
    dx, dp = _bwd_train_impl(x32.astype(jnp.bfloat16), params, seed,
                             dout.astype(jnp.bfloat16), 1e-5, p,
                             interpret=True)
    assert _rel_err(dx.astype(jnp.float32), dx_ref) < 5e-2
    for a, b in zip(jax.tree.leaves(dp), jax.tree.leaves(dp_ref)):
        assert _rel_err(np.asarray(a, np.float64), np.asarray(b)) < 5e-2


def test_flash_attention_bf16(rng):
    b, h, l, d = 1, 2, 256, 32
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(2 * 64, d)) * 0.1, jnp.float32)
    ref = relpos_attention_reference(q, k, v, pe, 64)
    out = _flash_relpos_attention_impl(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), pe, 64, interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    assert _rel_err(out.astype(jnp.float32), ref) < 3e-2


def test_depthwise_large_module_bf16(rng):
    """bf16 stream through the large-kernel depthwise path (fwd via XLA,
    bwd via the Pallas tap-loop kernel) — regression: the module used to
    pass the raw f32 kernel alongside a bf16 stream."""
    from sepreformer_tpu.models.blocks import DepthwiseConv1d

    x = jnp.asarray(rng.normal(size=(1, 256, 128)), jnp.float32)
    mod = DepthwiseConv1d(65, padding="SAME", fused="interpret")
    variables = mod.init(jax.random.key(0), x)

    y16 = mod.apply(variables, x.astype(jnp.bfloat16))
    y32_mod = DepthwiseConv1d(65, padding="SAME", fused="off")
    y32 = y32_mod.apply(variables, x)
    assert y16.dtype == jnp.bfloat16
    assert _rel_err(y16.astype(jnp.float32), y32) < 3e-2

    g = jax.grad(
        lambda v, x: jnp.sum(mod.apply(v, x.astype(jnp.bfloat16))
                             .astype(jnp.float32) ** 2)
    )(variables, x)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_fused_gcfn_f32_unchanged(rng):
    """The bf16 plumbing must not perturb the f32 path."""
    x = jnp.asarray(rng.normal(size=(2, 256, 128)), jnp.float32)
    params = _params(rng, f=128)
    ref = gcfn_reference(x, params, 1e-5)
    out = _fused_gcfn_impl(x, params, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
