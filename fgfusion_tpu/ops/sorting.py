"""Spatial (Morton / Z-order) sorting of padded point clouds.

Why: TPU row gathers are latency-bound, so the KPConv neighbor gathers
are served by a banded MXU kernel (ops/gather_pallas.py) that only
works if all neighbor indices of a tile of consecutive queries fall in
a narrow support window. The pyramid guarantees that by sorting every
level spatially: levels >= 1 are already voxel-lex-sorted by
grid_subsample (ops/voxel.py), and level 0 is Morton-sorted here once
per forward. Point order is semantically irrelevant everywhere else
(features/masks/neighbor tables are recomputed downstream of the
sort), so this is a pure layout transform.

The reference has no counterpart: its gathers are CUDA global-memory
loads where locality is handled by the cache hierarchy
(models/backbone_kpconv/finegrained_kpconv_blocks.py:296-320).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BITS = 10  # 1024 cells per axis -> 30-bit code fits int32


def _spread3(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of v so there are two zeros between
    consecutive bits (classic Morton bit-twiddle, 32-bit)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def cloud_bbox(points: jax.Array, mask: jax.Array):
    """(lo, extent) of the valid points — the Morton quantization frame.
    Shared across pyramid levels so codes are rank-comparable between a
    coarse level and its fine supports (banded kNN, neighbors.py)."""
    lo = jnp.min(jnp.where(mask[:, None], points, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(mask[:, None], points, -jnp.inf), axis=0)
    extent = jnp.maximum(jnp.max(hi - lo), 1e-9)
    return lo, extent


def morton_code(points: jax.Array, mask: jax.Array,
                lo: jax.Array | None = None,
                extent: jax.Array | None = None) -> jax.Array:
    """(N, 3) f32 + (N,) bool -> (N,) int32 Morton codes; invalid
    points get the maximum code so they sort last. Pass (lo, extent)
    to quantize in a shared frame (see cloud_bbox)."""
    if lo is None or extent is None:
        lo, extent = cloud_bbox(points, mask)
    q = ((points - lo) / extent * (2**_BITS - 1)).astype(jnp.int32)
    q = jnp.clip(q, 0, 2**_BITS - 1)
    code = (_spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1)
            | (_spread3(q[:, 2]) << 2))
    return jnp.where(mask, code, jnp.int32(0x7FFFFFFF))


def morton_order(points: jax.Array, mask: jax.Array) -> jax.Array:
    """Permutation (N,) int32: valid points in Morton order, padding
    last. Stable, so equal-code points keep their input order."""
    return jnp.argsort(morton_code(points, mask), stable=True).astype(jnp.int32)


def sort_cloud(points: jax.Array, mask: jax.Array):
    """Apply the Morton permutation. Returns (points, mask, order)."""
    order = morton_order(points, mask)
    return points[order], mask[order], order


def sort_cloud_with_codes(points: jax.Array, mask: jax.Array,
                          lo: jax.Array, extent: jax.Array):
    """Morton-sort in a shared frame; also return the sorted codes.
    Returns (points, mask, order, codes) — codes ascending, invalid
    points (code 0x7FFFFFFF) last."""
    codes = morton_code(points, mask, lo, extent)
    order = jnp.argsort(codes, stable=True).astype(jnp.int32)
    return points[order], mask[order], order, codes[order]
