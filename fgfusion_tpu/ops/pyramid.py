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
from .paged_gather import build_page_table
from .sorting import cloud_bbox, sort_cloud, sort_cloud_with_codes
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
    deform_radius: float = 5.0   # search-radius multiplier for levels
                                 # with deformable blocks (reference
                                 # finegrained_kpconv.py:472-499)
    approx_knn: bool = False     # TPU-fast approximate neighbor search
    fused_knn: bool = False      # serve approx kNN from the fused
                                 # Pallas kernel (ops/knn_pallas.py):
                                 # distance tiles never touch HBM
    knn_chunk: int = 2048        # query tile for the tiled distance search
    spatial_sort: bool = False   # Morton-sort level 0 (levels >= 1 are
                                 # voxel-lex-sorted by grid_subsample);
                                 # required for effective paged gathers
    knn_band_frac: float = 0.0   # banded neighbor search: window =
                                 # frac * Ns (rounded to 256) per tile
                                 # of knn_band_chunk sorted queries;
                                 # 0 = off. Implies Morton-sorting
                                 # EVERY level (shared frame) so code
                                 # ranks align across levels. An extra
                                 # approximation (recall measured in
                                 # tools/band_recall.py, DESIGN.md §13)
    knn_band_chunk: int = 512    # query tile for the banded search
    knn_band_min_ns: int = 4096  # only band levels with >= this many
                                 # supports (coarse levels are cheap to
                                 # search fully and band worst: recall
                                 # table in DESIGN.md §13)
    paged_p_max: Tuple[int, ...] = ()  # per-level page-list capacity for
                                 # the paged one-hot gather (0 = no page
                                 # table at that level; () disables)
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
            deform_radius=float(cfg.get("deform_radius", 5.0)),
            approx_knn=bool(cfg.get("approx_knn", False)),
            fused_knn=bool(cfg.get("fused_knn", False)),
            knn_chunk=int(cfg.get("knn_chunk", 2048)),
            spatial_sort=bool(cfg.get("spatial_sort", False)),
            knn_band_frac=float(cfg.get("knn_band_frac", 0.0)),
            knn_band_chunk=int(cfg.get("knn_band_chunk", 512)),
            knn_band_min_ns=int(cfg.get("knn_band_min_ns", 4096)),
            paged_p_max=tuple(cfg.get("paged_p_max", ())),
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


def scale_spec(spec: PyramidSpec, n0: int,
               headroom: float = 1.0) -> PyramidSpec:
    """Re-bucket a spec to level-0 capacity n0, scaling the deeper
    capacities proportionally (rounded up to 64). Used by the
    multi-bucket eval path: the reference evaluates full-size test
    clouds (its training-only 30k cap is data_loaders/transforms.py:98;
    PreprocessorGPU handles any N at test,
    finegrained_kpconv.py:431-542), so test pairs pick the smallest
    bucket that fits instead of being subsampled to one static size.

    `headroom` additionally multiplies the level>=1 capacities: train
    capacities are calibrated on the train distribution's voxel counts,
    but dense test fragments can occupy more voxels at the same point
    count (measured: 12633 needed vs 12288 scaled at the 32768 bucket),
    and the C++ reference never truncates voxels
    (cpp_wrappers/.../grid_subsampling.cpp:85-95) — eval passes
    cfg eval_capacity_headroom so protocol runs keep every voxel."""
    if n0 == spec.capacities[0] and headroom == 1.0:
        return spec
    ratio = n0 / spec.capacities[0]
    caps = [n0] + [max(64, (int(c * ratio * headroom) + 63) // 64 * 64)
                   for c in spec.capacities[1:]]
    return dataclasses.replace(spec, capacities=tuple(caps))


def _grouped_levels(architecture: Sequence[str]):
    """Split the architecture into per-level block groups, mirroring the
    grouping loop at finegrained_kpconv.py:455-532. Returns a list of
    (blocks_in_level, strided_block_name_or_None)."""
    groups = []
    current: List[str] = []
    for block in architecture:
        if "global" in block or "upsample" in block:
            break
        if "pool" in block or "strided" in block:
            groups.append((current, block))
            current = []
        else:
            current.append(block)
    groups.append((current, None))
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
    detection: compare against spec.capacities[l]). With
    spec.spatial_sort, level 0 is Morton-sorted and 'order' holds the
    (C, N0) permutation (callers indexing per-point level-0 data, e.g.
    GT overlap labels, must apply it). With spec.paged_p_max, 'pages'
    maps level -> per-tile page lists for the paged one-hot gather and
    'n_page_overflow' lists the (C,) truncated-tile counters.
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
    use_band = spec.knn_band_frac > 0.0
    codes = None
    bbox = None
    if use_band:
        # banding needs every level Morton-sorted in one shared frame
        # so code RANKS align between a coarse level and its fine
        # supports (the window centering is rank matching).
        bbox = jax.vmap(cloud_bbox)(points, mask)
        points, mask, order, codes = jax.vmap(sort_cloud_with_codes)(
            points, mask, *bbox)
        out["points"][0], out["masks"][0] = points, mask
        out["order"] = order
        out["codes"] = [codes]  # per-level sorted Morton codes (tests
                                # and tools/band_recall.py)
    elif spec.spatial_sort:
        points, mask, order = jax.vmap(sort_cloud)(points, mask)
        out["points"][0], out["masks"][0] = points, mask
        out["order"] = order
    if spec.paged_p_max:
        assert len(spec.paged_p_max) == num_levels, (
            f"paged_p_max {spec.paged_p_max} needs one entry per level")
        out["pages"] = {}
        out["n_page_overflow"] = []

    def band_for(ns: int) -> int:
        """Window width for a support axis of ns rows (0 = unbanded).
        Below knn_band_min_ns rows the full search is cheap (one MXU
        tile group) while Morton window recall is at its worst."""
        if not use_band or ns < max(4096, spec.knn_band_min_ns):
            return 0
        w = min(ns, max(2048, -(-int(ns * spec.knn_band_frac) // 256) * 256))
        return 0 if w >= ns else w

    def knn_b(q, qm, s, sm, radius, k, qc=None, sc=None):
        w = band_for(s.shape[1])
        if w and qc is not None and sc is not None:
            fn = lambda a, b, c, d, e, f: radius_knn(
                a, b, c, d, radius=radius, k=k, approx=spec.approx_knn,
                fused=spec.fused_knn, chunk=spec.knn_chunk, band=w,
                band_chunk=spec.knn_band_chunk, q_codes=e, s_codes=f)
            return jax.vmap(fn)(q, qm, s, sm, qc, sc)
        fn = lambda a, b, c, d: radius_knn(
            a, b, c, d, radius=radius, k=k, approx=spec.approx_knn,
            fused=spec.fused_knn, chunk=spec.knn_chunk)
        return jax.vmap(fn)(q, qm, s, sm)

    sub_b = jax.vmap(grid_subsample, in_axes=(0, 0, None, None))

    cur_pts, cur_mask = points, mask
    cur_codes = codes
    for level, (blocks, strided) in enumerate(groups):
        k = int(spec.neighborhood_limits[level])

        if blocks:
            # deformable blocks see a wider neighborhood. Reference
            # quirk preserved exactly (finegrained_kpconv.py:472-473):
            # only layer_blocks[:-1] is checked, so a level whose ONLY
            # deformable block is the last non-strided one still gets
            # the normal radius.
            r_conv = (r_normal * spec.deform_radius / spec.conv_radius
                      if any("deformable" in blk for blk in blocks[:-1])
                      else r_normal)
            conv_i = knn_b(cur_pts, cur_mask, cur_pts, cur_mask, r_conv, k,
                           cur_codes, cur_codes)
        else:
            # pooling-only level (reference emits an empty table here)
            conv_i = jnp.full(cur_pts.shape[:2] + (k,), cur_pts.shape[1], jnp.int32)
        out["neighbors"].append(conv_i)

        if spec.paged_p_max and spec.paged_p_max[level] > 0 and blocks:
            nq = conv_i.shape[1]
            tile_q = next(t for t in (128, 64, 32, 16, 8, 4, 2, 1)
                          if nq % t == 0)
            pages, n_over = build_page_table(
                conv_i, cur_pts.shape[1], tile_q, int(spec.paged_p_max[level]))
            out["pages"][level] = pages
            out["n_page_overflow"].append(n_over)

        if strided:
            cell = 2.0 * r_normal / spec.conv_radius
            cap = int(spec.capacities[level + 1])
            pool_p, pool_m, n_vox = sub_b(cur_pts, cur_mask, cell, cap)
            pool_codes = None
            if use_band:
                # re-sort the coarse level from voxel-lex to Morton in
                # the shared frame (order is semantically free: all its
                # tables are computed below, and per-point labels only
                # exist at level 0)
                pool_p, pool_m, _, pool_codes = jax.vmap(
                    sort_cloud_with_codes)(pool_p, pool_m, *bbox)
            # a deformable strided block pools over the wider radius
            # (finegrained_kpconv.py:498-499)
            r_pool = (r_normal * spec.deform_radius / spec.conv_radius
                      if "deformable" in strided else r_normal)
            pool_i = knn_b(pool_p, pool_m, cur_pts, cur_mask, r_pool, k,
                           pool_codes, cur_codes)

            out["points"].append(pool_p)
            out["masks"].append(pool_m)
            out["pools"].append(pool_i)
            if spec.need_upsamples:
                up_i = knn_b(cur_pts, cur_mask, pool_p, pool_m,
                             2.0 * r_normal, k, cur_codes, pool_codes)
                out["upsamples"].append(up_i)
            out["n_voxels"].append(n_vox)

            cur_pts, cur_mask = pool_p, pool_m
            cur_codes = pool_codes
            if use_band:
                out["codes"].append(pool_codes)
            r_normal *= 2.0

    return out
