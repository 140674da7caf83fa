"""Paged one-hot gather (ops/paged_gather.py) vs the XLA reference
gather: page-table construction, f32 bit-exactness on spatially-sorted
neighbor tables, sentinel handling, overflow truncation + counting
(interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fgfusion_tpu.models.kpconv import batched_gather
from fgfusion_tpu.ops.paged_gather import PAGE, build_page_table, paged_gather


def _sorted_case(seed=0, c=2, ns=900, d=7, nq=512, k=12, tile_q=64,
                 band=300):
    """Neighbor tables with banded indices, like spatially sorted
    clouds: query q's neighbors live near support row q * ns/nq."""
    rng = np.random.default_rng(seed)
    table = rng.normal(size=(c, ns, d)).astype(np.float32)
    center = (np.arange(nq) * ns // nq)[None, :, None]
    idx = center + rng.integers(-band // 2, band // 2, size=(c, nq, k))
    idx = np.clip(idx, 0, ns - 1).astype(np.int32)
    # sprinkle sentinels (missing neighbors)
    idx[rng.random(size=idx.shape) < 0.1] = ns
    return jnp.asarray(table), jnp.asarray(idx), tile_q


def test_page_table_covers_all_pages():
    table, idx, tile_q = _sorted_case()
    ns = table.shape[1]
    pages, n_overflow = build_page_table(idx, ns, tile_q, p_max=8)
    assert int(jnp.sum(n_overflow)) == 0
    pages = np.asarray(pages)
    idx_np = np.asarray(idx)
    t = idx_np.shape[1] // tile_q
    for ci in range(idx_np.shape[0]):
        for ti in range(t):
            blk = idx_np[ci, ti * tile_q:(ti + 1) * tile_q]
            need = np.unique(blk[blk < ns] // PAGE)
            have = set(pages[ci, ti][pages[ci, ti] >= 0])
            assert set(need) <= have
    # ascending, -1 padded at the end
    for row in pages.reshape(-1, pages.shape[-1]):
        real = row[row >= 0]
        assert (np.diff(real) > 0).all()
        assert (row[len(real):] == -1).all()


def test_f32_bit_exact():
    table, idx, tile_q = _sorted_case()
    ns = table.shape[1]
    pages, n_overflow = build_page_table(idx, ns, tile_q, p_max=8)
    assert int(jnp.sum(n_overflow)) == 0
    out = paged_gather(table, idx, pages, tile_q=tile_q)
    ref = batched_gather(table, idx, 0.0)
    assert out.shape == ref.shape
    assert float(jnp.max(jnp.abs(out - ref))) == 0.0


def test_bf16_close():
    table, idx, tile_q = _sorted_case()
    pages, _ = build_page_table(idx, table.shape[1], tile_q, p_max=8)
    out = paged_gather(table, idx, pages, tile_q=tile_q,
                       eq_dtype="bfloat16")
    ref = batched_gather(table, idx, 0.0)
    assert float(jnp.max(jnp.abs(out - ref))) < 0.05


def test_sentinel_rows_zero():
    table, idx, tile_q = _sorted_case()
    ns = table.shape[1]
    pages, _ = build_page_table(idx, ns, tile_q, p_max=8)
    out = paged_gather(table, idx, pages, tile_q=tile_q)
    sent = np.asarray(idx) == ns
    assert sent.any()
    assert float(jnp.max(jnp.abs(np.asarray(out)[sent]))) == 0.0


def test_overflow_truncates_and_counts():
    # random (unsorted) indices spanning many pages with a tiny p_max:
    # truncated tiles must (a) be counted, (b) zero exactly the rows
    # whose page was dropped
    rng = np.random.default_rng(1)
    c, ns, d, nq, k, tile_q = 1, 1024, 5, 128, 16, 64
    table = jnp.asarray(rng.normal(size=(c, ns, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, ns, size=(c, nq, k)).astype(np.int32))
    pages, n_overflow = build_page_table(idx, ns, tile_q, p_max=2)
    assert int(n_overflow[0]) == nq // tile_q  # every tile overflows
    out = np.asarray(paged_gather(table, idx, pages, tile_q=tile_q))
    ref = np.asarray(batched_gather(table, idx, 0.0))
    pages = np.asarray(pages)
    idx_np = np.asarray(idx)
    for ti in range(nq // tile_q):
        covered = set(pages[0, ti][pages[0, ti] >= 0])
        blk = slice(ti * tile_q, (ti + 1) * tile_q)
        in_cover = np.isin(idx_np[0, blk] // PAGE, list(covered))
        np.testing.assert_array_equal(out[0, blk][in_cover],
                                      ref[0, blk][in_cover])
        assert np.abs(out[0, blk][~in_cover]).max() == 0.0


def test_full_table_few_pages():
    # ns smaller than one page: page list is just [0]
    table, idx, tile_q = _sorted_case(ns=200, band=200, nq=128, k=8)
    ns = table.shape[1]
    pages, n_overflow = build_page_table(idx, ns, tile_q, p_max=4)
    assert int(jnp.sum(n_overflow)) == 0
    out = paged_gather(table, idx, pages, tile_q=tile_q)
    ref = batched_gather(table, idx, 0.0)
    assert float(jnp.max(jnp.abs(out - ref))) == 0.0
