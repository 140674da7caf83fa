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

Implementation is scatter-free (TPU scatters serialize): one
lexicographic sort groups voxels contiguously, then segment means come
from prefix sums gathered at the segment boundaries
(jnp.nonzero(..., size=capacity) gives the static-shape boundary list).
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
    n = points.shape[0]
    big = jnp.float32(1e9)
    pts_valid = jnp.where(mask[:, None], points, big)
    mins = jnp.min(pts_valid, axis=0)
    origin = jnp.floor(mins / cell) * cell

    ijk = jnp.floor((points - origin) / cell).astype(jnp.int32)
    ijk = jnp.where(mask[:, None], ijk, _INVALID_COORD)

    # Lexicographic sort by (z, y, x): numpy lexsort semantics — last
    # key is primary. Lowered as a single multi-operand lax.sort.
    order = jnp.lexsort((ijk[:, 0], ijk[:, 1], ijk[:, 2]))
    ijk_s = ijk[order]
    pts_s = points[order]
    mask_s = mask[order]

    # Voxel boundaries: first element, or any coordinate change. A valid
    # voxel's first (sorted) point is valid because invalid points sort
    # strictly after all valid ones and share no voxel with them.
    diff = jnp.any(ijk_s[1:] != ijk_s[:-1], axis=1)
    boundary = jnp.concatenate([jnp.ones((1,), dtype=bool), diff])
    valid_boundary = boundary & mask_s

    # Static-shape segment starts: indices of the first `capacity`
    # valid-voxel boundaries (fill = n for absent segments). One extra
    # start is taken so that on overflow the last *kept* voxel's segment
    # ends at the first *dropped* voxel's start — overflow truncates
    # cleanly (every kept voxel a true barycenter, C++ parity
    # grid_subsampling.cpp:85-95) instead of the tail of the cloud
    # collapsing into the final barycenter.
    starts_p1 = jnp.nonzero(valid_boundary, size=capacity + 1, fill_value=n)[0]
    starts = starts_p1[:capacity]
    new_mask = starts < n

    # Prefix sums (one zero row prepended) -> segment sums by gather.
    w = mask_s.astype(points.dtype)
    csum_pts = jnp.concatenate(
        [jnp.zeros((1, 3), points.dtype), jnp.cumsum(pts_s * w[:, None], axis=0)])
    csum_cnt = jnp.concatenate(
        [jnp.zeros((1,), points.dtype), jnp.cumsum(w)])

    # Segment end = next valid-boundary start overall (fill n past the
    # last occupied voxel — exact, because invalid points carry zero
    # weight).
    ends = jnp.minimum(starts_p1[1:], n)
    safe_starts = jnp.minimum(starts, n)

    seg_sum = csum_pts[ends] - csum_pts[safe_starts]
    seg_cnt = csum_cnt[ends] - csum_cnt[safe_starts]

    new_points = seg_sum / jnp.clip(seg_cnt[:, None], 1.0, None)
    new_points = jnp.where(new_mask[:, None], new_points, 1e6)

    n_occupied = jnp.sum(valid_boundary).astype(jnp.int32)
    return new_points, new_mask, n_occupied
