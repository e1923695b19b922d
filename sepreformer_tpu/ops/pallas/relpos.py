"""Pallas materializer for the shared rel-pos bias tensor ``pos_kt``.

The XLA attention path consumes ``pos_kt[i, d, j] = table[clip(i - j)]``
(the bias operand of ``einsum("bihd,idj->bhij")``; reference math at
modules/network.py:106-113, clamp at modules/module.py:53-54).  Built
with an XLA gather (`blocks.gather_pos_kt`), the tensor comes out in the
gather's d-minor layout — d=16 fills 16 of 128 lanes — and profiling on
v5e showed XLA's layout assignment then re-copies it per consuming block
(~16% of the B=4 forward; ARCHITECTURE.md).  `optimization_barrier`
does not help: the copies come from layout *assignment*, which
propagates through barriers.

This kernel generates the same tensor with its layout pinned to the
dot-operand order (row-major [i, d, j]: j on lanes, 128-aligned at the
padded length).  A pallas_call is a custom call with fixed result
layouts, so XLA can neither re-fuse the gather into each consumer nor
assign the d-minor layout — the relayout copies never exist.

Generation is gather-free: for row i the needed table rows form a
contiguous window of the row-reversed clamped table (the same
observation the flash kernel exploits), so each output row is one
dynamic lane-roll of a resident [d, 2*tp] tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _pe_revT(table: jnp.ndarray, tp: int, maxlen: int) -> jnp.ndarray:
    """[d, 2*tp] transposed row-reversed clamped table.

    Column c holds table[clip(tp - 1 - c, -maxlen, maxlen - 1)], so for
    output row i the window starting at column (tp - 1 - i) reads
    table[clip(i - j)] for j = 0..tp-1 — ascending in j.
    """
    rel = tp - 1 - np.arange(2 * tp)
    idx = np.clip(rel, -maxlen, maxlen - 1) + maxlen
    return jnp.take(table, np.asarray(idx, np.int32), axis=0).T


def _kernel(pe_ref, out_ref, *, bi: int, tp: int, t: int):
    i0 = pl.program_id(0) * bi
    pe = pe_ref[:]                                    # [d, 2*tp]
    n = 2 * tp

    def body(di, _):
        # out[di, :, j] = pe[:, (tp-1-(i0+di)) + j]  -> circular right
        # roll by n - start (no wraparound reaches j < t)
        shift = tp + 1 + i0 + di                      # == n - (tp-1-i)
        rolled = pltpu.roll(pe, shift, axis=1)
        out_ref[di] = rolled[:, :t]
        return 0

    jax.lax.fori_loop(0, bi, body, 0)


ROW_BLOCK_BYTES = 4 * 1024 * 1024


def _pick_bi(t: int, d: int) -> int:
    """Largest divisor of t with the [bi, d, t] out block within budget
    (double-buffered by the pipeline) and <= 64 rows.  At the bottleneck
    length 500 this picks 50 — identical to the original fixed choice —
    while long-form lengths (t=2000: bi=25) stay under the 16 MB scoped
    vmem limit the fixed bi=50 block blew at L=2000 (12.8 MB of out
    buffers alone; the r5 fused_pv/16s compile failure)."""
    cap = max(1, ROW_BLOCK_BYTES // (d * t * 4))
    for bi in range(min(t, cap, 64), 0, -1):
        if t % bi == 0:
            return bi
    return t


@functools.partial(jax.jit, static_argnames=("t", "maxlen", "interpret"))
def _materialize_pos_kt_impl(table: jnp.ndarray, t: int, maxlen: int,
                             interpret: bool = False) -> jnp.ndarray:
    """[t, d, t] pos_kt == blocks.gather_pos_kt, layout-pinned row-major."""
    d = table.shape[1]
    tp = max(LANE, ((t + LANE - 1) // LANE) * LANE)
    pe = _pe_revT(table.astype(jnp.float32), tp, maxlen)
    bi = _pick_bi(t, d)
    nb = t // bi
    kernel = functools.partial(_kernel, bi=bi, tp=tp, t=t)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((d, 2 * tp), lambda ii: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bi, d, t), lambda ii: (ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, d, t), jnp.float32),
        interpret=interpret,
    )(pe)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def materialize_pos_kt(table, t: int, maxlen: int, interpret: bool = False):
    """Layout-pinned pos_kt with the gather path's exact adjoint (the
    tensor is a linear gather of ``table``, so d(table) is the standard
    transpose-gather scatter-add — identical numerics to
    `gather_pos_kt`'s autodiff)."""
    return _materialize_pos_kt_impl(table, t, maxlen, interpret)


def _mat_fwd(table, t, maxlen, interpret):
    return _materialize_pos_kt_impl(table, t, maxlen, interpret), table


def _mat_bwd(t, maxlen, interpret, table, g):
    from sepreformer_tpu.models.blocks import gather_pos_kt

    _, vjp = jax.vjp(lambda tab: gather_pos_kt(tab, t, maxlen), table)
    return vjp(g.astype(table.dtype))


materialize_pos_kt.defvjp(_mat_fwd, _mat_bwd)


def resolve_relpos_materializer(setting: str) -> str:
    """"auto" = "pallas" on TPU, "gather" elsewhere — MEASURED
    (measure_relpos.py -> MEASURE_RELPOS.json, v5e): the layout-pinned
    generator takes the full-model Base B=4 forward from 23.74 to
    23.12 ms (bit-identical output) by removing the gather-layout
    relayout copies.  The Engine forces "gather" under the model mesh
    axis (pallas_call operands have no GSPMD partitioning rule)."""
    if setting == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "gather"
    return setting
