"""Barycenter voxel-grid subsampling, on device, static shapes.

TPU-native replacement for the reference's C++ `grid_subsampling`
extension (cpp_wrappers/.../grid_subsampling.cpp:5-106) and the
MinkowskiEngine sparse-quantization GPU path
(finegrained_kpconv.py:218-245). Semantics preserved:

- voxel of a point = floor((p - origin) / cell) per axis, where
  origin = floor(min(points)/cell) * cell (C++ parity; the exact origin
  matters for which points share a voxel)
- output point = barycenter (mean) of the points in its voxel

Differences by design:
- output has a static capacity `capacity`; real voxel count is dynamic
  and returned for overflow detection. Voxels are emitted in
  lexicographic (z, y, x) order — deterministic, unlike both reference
  paths (unordered_map / nondeterministic GPU quantization, noted at
  finegrained_kpconv.py:222-224).
- padded/invalid input points never contribute (they sort to the end
  into zero-count voxels that are masked out).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Sentinel voxel coordinate for invalid points: larger than any real
# voxel index so invalid points sort last and never share a voxel with
# a real one.
_INVALID_COORD = jnp.int32(2 ** 24)


def grid_subsample(points: jax.Array, mask: jax.Array, cell: float, capacity: int):
    """Subsample one padded cloud by averaging points per voxel.

    Args:
        points: (N, 3) float32, padded.
        mask: (N,) bool validity.
        cell: voxel edge length (static).
        capacity: static output size M. If the cloud has more than
            `capacity` occupied voxels, trailing voxels (in z,y,x lex
            order) are dropped.

    Returns:
        new_points: (M, 3) barycenters (invalid slots = 1e6 sentinel,
            so downstream radius searches can never match them).
        new_mask: (M,) bool.
        n_voxels: () int32 — true number of occupied voxels (may exceed
            capacity; use to detect overflow).
    """
    big = jnp.float32(1e9)
    pts_valid = jnp.where(mask[:, None], points, big)
    mins = jnp.min(pts_valid, axis=0)
    origin = jnp.floor(mins / cell) * cell

    ijk = jnp.floor((points - origin) / cell).astype(jnp.int32)
    ijk = jnp.where(mask[:, None], ijk, _INVALID_COORD)

    # Lexicographic sort by (z, y, x): numpy lexsort semantics — last
    # key is primary.
    order = jnp.lexsort((ijk[:, 0], ijk[:, 1], ijk[:, 2]))
    ijk_s = ijk[order]
    pts_s = points[order]
    mask_s = mask[order]

    # Voxel boundaries: first element, or any coordinate change.
    diff = jnp.any(ijk_s[1:] != ijk_s[:-1], axis=1)
    boundary = jnp.concatenate([jnp.ones((1,), dtype=bool), diff])
    voxel_id = jnp.cumsum(boundary.astype(jnp.int32)) - 1  # (N,)

    n_voxels_total = voxel_id[-1] + 1
    # Voxels made only of invalid points sit at the tail; they carry
    # zero valid count and are masked below, so no correction needed.

    w = mask_s.astype(points.dtype)
    sums = jax.ops.segment_sum(pts_s * w[:, None], voxel_id, num_segments=capacity)
    counts = jax.ops.segment_sum(w, voxel_id, num_segments=capacity)

    new_mask = counts > 0
    new_points = sums / jnp.clip(counts[:, None], 1.0, None)
    new_points = jnp.where(new_mask[:, None], new_points, 1e6)

    n_valid_voxels = jnp.sum(
        jax.ops.segment_max(w, voxel_id, num_segments=capacity) > 0
    ).astype(jnp.int32)
    del n_valid_voxels  # counted within capacity only; report total instead

    # True occupied-voxel count (valid points only): number of
    # boundaries among valid points.
    n_occupied = jnp.sum(boundary & mask_s).astype(jnp.int32)
    # boundary marks a new voxel; a valid voxel's first (sorted) point
    # is valid because invalid points sort strictly after all valid
    # ones and share no voxel with them.
    del n_voxels_total
    return new_points, new_mask, n_occupied
