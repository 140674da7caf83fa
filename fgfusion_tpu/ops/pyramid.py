"""Multi-scale pyramid metadata builder — on device, inside jit.

TPU-native equivalent of the reference's `PreprocessorGPU.forward`
(finegrained_kpconv.py:431-542): for each pyramid level it computes

- conv neighbor tables at radius r_l (for the level's KPConv blocks),
- on strided levels: grid-subsampled points (cell = 2 * r_l /
  conv_radius), pooling neighbor tables (queries = coarse points,
  supports = fine points, radius r_l), and upsampling tables (queries =
  fine points, supports = coarse points, radius 2 * r_l),

but over *fixed-capacity padded arrays with validity masks* instead of
ragged packed tensors, and batched over the cloud axis (the reference's
`stack_lengths` bookkeeping becomes a boolean mask). The whole builder
is jit-compatible: level structure and capacities are static, point
counts are dynamic via masks.

Index conventions (per level l with capacity N_l):
    neighbors[l]: (C, N_l,   K_l) into level l,   sentinel = N_l
    pools[l]:     (C, N_{l+1}, K_l) into level l,   sentinel = N_l
    upsamples[l]: (C, N_l,   K_l) into level l+1, sentinel = N_{l+1}
Neighbor lists are sorted by ascending distance (column 0 = nearest).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .neighbors import radius_knn
from .voxel import grid_subsample


@dataclasses.dataclass(frozen=True)
class PyramidSpec:
    """Static description of the pyramid (hashable: usable as a jit
    static argument)."""

    architecture: Tuple[str, ...]
    first_subsampling_dl: float
    conv_radius: float
    neighborhood_limits: Tuple[int, ...]
    capacities: Tuple[int, ...]  # per-level point capacity; [0] = input
    approx_knn: bool = False     # TPU-fast approximate neighbor search
    knn_chunk: int = 2048        # query tile for the tiled distance search
    need_upsamples: bool = False  # upsample tables feed only the
                                  # decoder, which RegTR never uses
                                  # (finegrained_kpconv.py:99-100);
                                  # skipping them cuts 3 of the 10
                                  # radius searches per forward

    @classmethod
    def from_config(cls, cfg, capacities: Sequence[int]) -> "PyramidSpec":
        cfg = dict(cfg)
        return cls(
            architecture=tuple(cfg["architecture"]),
            first_subsampling_dl=float(cfg["first_subsampling_dl"]),
            conv_radius=float(cfg["conv_radius"]),
            neighborhood_limits=tuple(cfg["neighborhood_limits"]),
            capacities=tuple(capacities),
            approx_knn=bool(cfg.get("approx_knn", False)),
        )

    @property
    def num_levels(self) -> int:
        n = 1
        for block in self.architecture:
            if "global" in block or "upsample" in block:
                break
            if "pool" in block or "strided" in block:
                n += 1
        return n

    def level_radii(self) -> List[float]:
        r = self.first_subsampling_dl * self.conv_radius
        return [r * (2.0 ** l) for l in range(self.num_levels)]


def _grouped_levels(architecture: Sequence[str]):
    """Split the architecture into per-level block groups, mirroring the
    grouping loop at finegrained_kpconv.py:455-532. Returns a list of
    (blocks_in_level, ends_with_strided)."""
    groups = []
    current: List[str] = []
    for block in architecture:
        if "global" in block or "upsample" in block:
            break
        if "pool" in block or "strided" in block:
            groups.append((current, True))
            current = []
        else:
            current.append(block)
    groups.append((current, False))
    return groups


def build_pyramid(points: jax.Array, mask: jax.Array, spec: PyramidSpec) -> Dict:
    """Build the full pyramid for a batch of padded clouds.

    Args:
        points: (C, N0, 3) float32 — C clouds (typically src+tgt stacked
            on the leading axis), padded to the level-0 capacity.
        mask: (C, N0) bool validity.
        spec: static pyramid description.

    Returns dict of per-level lists (see module docstring) plus
    'n_voxels': list of (C,) occupancy counts for levels >= 1 (overflow
    detection: compare against spec.capacities[l]).
    """
    assert points.shape[1] == spec.capacities[0], (
        f"level-0 capacity mismatch: {points.shape[1]} vs {spec.capacities[0]}")
    groups = _grouped_levels(spec.architecture)
    num_levels = len(groups)
    assert num_levels == len(spec.capacities), (
        f"capacities {spec.capacities} must have one entry per level ({num_levels})")

    r_normal = spec.first_subsampling_dl * spec.conv_radius

    out = {
        "points": [points],
        "masks": [mask],
        "neighbors": [],
        "pools": [],
        "upsamples": [],
        "n_voxels": [],
    }

    knn_b = jax.vmap(
        lambda q, qm, s, sm, radius, k: radius_knn(
            q, qm, s, sm, radius=radius, k=k, approx=spec.approx_knn,
            chunk=spec.knn_chunk),
        in_axes=(0, 0, 0, 0, None, None))
    sub_b = jax.vmap(grid_subsample, in_axes=(0, 0, None, None))

    cur_pts, cur_mask = points, mask
    for level, (blocks, strided) in enumerate(groups):
        k = int(spec.neighborhood_limits[level])

        if blocks:
            conv_i = knn_b(cur_pts, cur_mask, cur_pts, cur_mask, r_normal, k)
        else:
            # pooling-only level (reference emits an empty table here)
            conv_i = jnp.full(cur_pts.shape[:2] + (k,), cur_pts.shape[1], jnp.int32)
        out["neighbors"].append(conv_i)

        if strided:
            cell = 2.0 * r_normal / spec.conv_radius
            cap = int(spec.capacities[level + 1])
            pool_p, pool_m, n_vox = sub_b(cur_pts, cur_mask, cell, cap)
            pool_i = knn_b(pool_p, pool_m, cur_pts, cur_mask, r_normal, k)

            out["points"].append(pool_p)
            out["masks"].append(pool_m)
            out["pools"].append(pool_i)
            if spec.need_upsamples:
                up_i = knn_b(cur_pts, cur_mask, pool_p, pool_m,
                             2.0 * r_normal, k)
                out["upsamples"].append(up_i)
            out["n_voxels"].append(n_vox)

            cur_pts, cur_mask = pool_p, pool_m
            r_normal *= 2.0

    return out
