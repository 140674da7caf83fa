"""Neighbor gather as a one-hot matmul Pallas kernel.

Why: XLA lowers `take_along_axis` row gathers on TPU to a
latency-bound per-row loop (device trace: the KPConv neighbor gathers
run at a few % of HBM peak and dominate the encoder). For pyramid
levels whose support table fits comfortably in VMEM, the gather can
instead be computed on the MXU: build a one-hot selection tile
`eq[r, s] = (idx[r] == s)` in VMEM and matmul it with the support
table — `out = eq @ table` selects exactly the indexed rows. The
selection matmul is compute-bound (rows x Ns x D), so it can only win
where Ns is small.

Measured verdict (v5e, 12k-pt 3DMatch bucket, 2026-08-16): standalone
it beats a standalone XLA gather only at the coarsest level
(L3 Ns=576: 1.6 vs 2.1 ms; L1/L2 tie or lose; bf16 eq required — the
f32 HIGHEST path is 6x slower from the x3-pass matmuls). Inside the
full model XLA fuses the gather with the influence/einsum consumers
and those fusions are faster still (trace: L3 conv fusions < 0.5 ms),
so this kernel is NOT wired into KPConvOp by default. It is kept as a
tested building block: the round-2 plan (STATUS.md) upgrades it to a
windowed/banded variant with scalar-prefetched per-tile support
windows, which shrinks the one-hot width from Ns to the ~500-row
spatial band that voxel-sorted point order gives, making the MXU path
profitable at every level.

Exactness: with eq in f32 and precision=HIGHEST the selection is
bit-exact (each output row sums exactly one table row plus zeros; the
bf16x3 product decomposition reconstructs the f32 row exactly when the
other operand is 0/1). With eq_dtype=bfloat16 the table is rounded to
bf16 — faster, inexact.

Replaces (for small levels) the XLA gather in
fgfusion_tpu/models/kpconv.py:batched_gather; semantics match the
reference's shadow-neighbor convention (sentinel index == Ns -> zero
row; reference models/backbone_kpconv/finegrained_kpconv_blocks.py:296
appends an explicit zero shadow row instead).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(idx_ref, tab_ref, out_ref, *, tile_s: int, ns: int,
            eq_dtype, precision):
    j = pl.program_id(2)
    rows = idx_ref[0]                                           # (R, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tile_s), 1) + j * tile_s
    # sentinel (== ns) and table padding (col >= ns) never match a row
    eq = jnp.logical_and(rows == col, col < ns).astype(eq_dtype)
    # zero the table's out-of-bounds padding rows: the block beyond ns
    # holds unspecified values and 0 * garbage would poison the dot
    row_valid = (jax.lax.broadcasted_iota(jnp.int32, (tile_s, 1), 0)
                 + j * tile_s) < ns
    tab = jnp.where(row_valid, tab_ref[0], 0.0)
    part = jnp.dot(eq, tab.astype(eq_dtype),
                   preferred_element_type=jnp.float32,
                   precision=precision)

    @pl.when(j == 0)
    def _():
        out_ref[0] = part

    @pl.when(j > 0)
    def _():
        out_ref[0] = out_ref[0] + part


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_s",
                                             "eq_dtype", "interpret"))
def onehot_gather(table: jax.Array, idx: jax.Array, *,
                  tile_q: int = 128, tile_s: int = 512,
                  eq_dtype: str = "float32",
                  interpret: bool | None = None) -> jax.Array:
    """table (C, Ns, D) f32, idx (C, Nq, K) int32 with sentinel Ns
    -> (C, Nq, K, D) f32; sentinel rows are exactly zero.
    """
    c, ns, d = table.shape
    _, nq, k = idx.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # pad Nq so the query grid divides; padded rows gather zeros.
    # idx is pre-flattened to (C, Nq*K, 1): Mosaic cannot shape-cast
    # (Tq, K) -> (Tq*K, 1) inside the kernel (K is not lane-aligned).
    nq_p = _round_up(nq, tile_q)
    if nq_p != nq:
        idx = jnp.pad(idx, ((0, 0), (0, nq_p - nq), (0, 0)),
                      constant_values=ns)
    idx_flat = idx.reshape(c, nq_p * k, 1)
    grid = (c, nq_p // tile_q, pl.cdiv(ns, tile_s))
    eq_dt = jnp.dtype(eq_dtype)
    precision = (jax.lax.Precision.HIGHEST if eq_dt == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    out = pl.pallas_call(
        functools.partial(_kernel, tile_s=tile_s, ns=ns, eq_dtype=eq_dt,
                          precision=precision),
        out_shape=jax.ShapeDtypeStruct((c, nq_p * k, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q * k, 1), lambda ci, qi, si: (ci, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_s, d), lambda ci, qi, si: (ci, si, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_q * k, d), lambda ci, qi, si: (ci, qi, 0),
            memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx_flat, table)
    return out.reshape(c, nq_p, k, d)[:, :nq]
