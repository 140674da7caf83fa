"""Paged one-hot neighbor gather: MXU gather over per-tile page lists.

Round-2 upgrade of ops/gather_pallas.py (full-table one-hot), per the
measured plan in STATUS.md/DESIGN.md §10. TPU row gathers are
latency-bound (~5-10 cy/row regardless of width), so XLA serves the
KPConv neighbor gathers at ~100 GB/s effective. The one-hot matmul
moves the gather onto the MXU, but its cost is rows x WIDTH x D — with
the full support table as width it only wins at the coarsest level.

This kernel shrinks the width to the set of 256-row PAGES a tile of
consecutive queries actually touches. Pyramid levels are spatially
sorted (levels >= 1 voxel-lex by construction, level 0 Morton-sorted in
build_pyramid), so a tile of TILE_Q consecutive queries touches few
pages (measured on the 12k bench workload, tools/band_experiment2.py:
L0 p99 = 16 pages of 48, L1 10/16, L2 6/6, L3 2/3). Per grid step the
kernel fetches ONE page of the support table — chosen by a
scalar-prefetched per-tile page list, i.e. a data-dependent BlockSpec
index_map — and accumulates `(idx == page*P + lane) @ page_rows`.

Cost model — and why this is NOT wired into the shipped configs: the
MXU quantizes every matmul dimension to 128 lanes, so the selection
matmul costs rows x window x max(D, 128) x passes no matter how thin
the gathered row is. At the 12k bench workload the measured page
windows are 4-6k rows (tools/band_experiment2.py: L0 p99 = 16 pages
of 256 even after Morton sorting — the "~500-row band" hypothesis
from round 1 was wrong for volumetric clouds), which prices the L0
selection at tens of ms vs XLA's ~5.8 ms latency-bound gather
(~6 ns/row). The kernel only wins where rows x window is small, i.e.
the coarsest levels, where the XLA gather is already sub-ms. It is
kept as a correct, tested building block (and as the measured record
of why the MXU cannot rescue TPU gathers at these shapes); KPConvOp
dispatches to it only when a page table is present in the pyramid
meta, which no shipped config requests.

Exactness: each output row sums exactly one table row (pages are
distinct, the sentinel's page id Ns>>8 is never listed) plus zeros.
f32 mode splits the table into 3 bfloat16 parts (t0 + t1 + t2 == t
exactly: 3 x 8 mantissa bits cover f32's 24) and runs 3 bf16 MXU
passes — the 0/1 selector is exact in bf16, so each output row
reconstructs the f32 table row bit-exactly at HALF the cost of
precision=HIGHEST's 6 passes. bf16 mode rounds the table to bfloat16
(1 MXU pass, inexact) for fat-D experiments.

Replaces (where wired) the take_along_axis gather in
fgfusion_tpu/models/kpconv.py; reference semantics at
models/backbone_kpconv/finegrained_kpconv_blocks.py:296 (shadow row).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAGE = 256  # support rows per page; >>8 is the page id


def build_page_table(idx: jax.Array, ns: int, tile_q: int,
                     p_max: int) -> tuple[jax.Array, jax.Array]:
    """Per-tile page lists for the paged gather.

    Args:
        idx: (C, Nq, K) int32 neighbor table, sentinel = ns.
        ns: support count (static).
        tile_q: queries per tile (static; must divide Nq).
        p_max: page-list capacity (static). Tiles touching more pages
            are truncated to the first p_max pages in ascending order
            — monitor via the returned overflow counter.

    Returns:
        pages: (C, T, p_max) int32 page ids ascending, -1 padded.
        n_overflow: (C,) int32 count of truncated tiles.
    """
    c, nq, k = idx.shape
    assert nq % tile_q == 0, (nq, tile_q)
    t = nq // tile_q
    n_pages = (ns + PAGE - 1) // PAGE

    v = idx.reshape(c, t, tile_q * k)
    # occupancy bitmap per tile: page p is touched iff any valid idx
    # lands in it (sentinel ns maps to page ns>>8 which is excluded by
    # the < ns test, so shadow neighbors never fetch a page)
    pids = v // PAGE                                       # (C, T, R)
    valid = v < ns
    page_iota = jnp.arange(n_pages, dtype=jnp.int32)       # (P,)
    hit = (pids[..., None] == page_iota) & valid[..., None]
    bitmap = jnp.any(hit, axis=2)                          # (C, T, P)

    # compact: touched page ids ascending, untouched -> big, sort, trim
    big = jnp.int32(0x7FFFFFF)
    ranked = jnp.where(bitmap, page_iota, big)
    ranked = jnp.sort(ranked, axis=-1)
    if n_pages < p_max:
        ranked = jnp.pad(ranked, ((0, 0), (0, 0), (0, p_max - n_pages)),
                         constant_values=big)
    pages = jnp.where(ranked[..., :p_max] == big, -1,
                      ranked[..., :p_max]).astype(jnp.int32)
    n_overflow = jnp.sum(jnp.sum(bitmap, axis=-1) > p_max,
                         axis=-1).astype(jnp.int32)
    return pages, n_overflow


def _kernel(pages_ref, idx_ref, tab_ref, out_ref, *, exact: bool):
    c, t, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    pid = pages_ref[c, t, j]
    rows = idx_ref[0]                                            # (R, 1)
    col = (jax.lax.broadcasted_iota(jnp.int32, (1, PAGE), 1)
           + pid * PAGE)
    # empty page slots (pid == -1) produce col < 0: never matches
    eq = (rows == col).astype(jnp.bfloat16)
    tab = tab_ref[0]
    if exact:
        # exact f32 via 3 bf16 passes: t0+t1+t2 == tab bit-exactly
        # (each residual subtraction is exact in f32; 3 x 8 mantissa
        # bits cover f32's 24), and the 0/1 selector is exact in bf16,
        # so each selected row is reconstructed bit-exactly.
        t0 = tab.astype(jnp.bfloat16)
        r1 = tab - t0.astype(jnp.float32)
        t1 = r1.astype(jnp.bfloat16)
        t2 = (r1 - t1.astype(jnp.float32)).astype(jnp.bfloat16)
        part = (jnp.dot(eq, t0, preferred_element_type=jnp.float32)
                + jnp.dot(eq, t1, preferred_element_type=jnp.float32)
                + jnp.dot(eq, t2, preferred_element_type=jnp.float32))
    else:
        part = jnp.dot(eq, tab.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[0] = part

    @pl.when(j > 0)
    def _():
        out_ref[0] = out_ref[0] + part


@functools.partial(jax.jit, static_argnames=("tile_q", "eq_dtype",
                                             "interpret"))
def paged_gather(table: jax.Array, idx: jax.Array, pages: jax.Array, *,
                 tile_q: int = 128, eq_dtype: str = "float32",
                 interpret: bool | None = None) -> jax.Array:
    """table (C, Ns, D) f32, idx (C, Nq, K) int32 sentinel = Ns,
    pages (C, T, P_max) from build_page_table -> (C, Nq, K, D) f32.
    Sentinel / out-of-page-list rows are exactly zero.
    """
    c, ns, d = table.shape
    _, nq, k = idx.shape
    t = nq // tile_q
    assert pages.shape[:2] == (c, t), (pages.shape, (c, t))
    p_max = pages.shape[2]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # pad the table to whole pages: the last page's block would
    # otherwise read out of bounds (pad rows are never selected: their
    # global row ids are >= ns and idx sentinel rows never match)
    ns_p = (ns + PAGE - 1) // PAGE * PAGE
    if ns_p != ns:
        table = jnp.pad(table, ((0, 0), (0, ns_p - ns), (0, 0)))

    idx_flat = idx.reshape(c, nq * k, 1)
    exact = jnp.dtype(eq_dtype) == jnp.float32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c, t, p_max),
        in_specs=[
            pl.BlockSpec((1, tile_q * k, 1),
                         lambda ci, ti, ji, pages_ref: (ci, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PAGE, d),
                         lambda ci, ti, ji, pages_ref: (
                             ci, jnp.maximum(pages_ref[ci, ti, ji], 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_q * k, d),
            lambda ci, ti, ji, pages_ref: (ci, ti, 0),
            memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, exact=exact),
        out_shape=jax.ShapeDtypeStruct((c, nq * k, d), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pages, idx_flat, table)
    return out.reshape(c, nq, k, d)
