"""Host-side point-cloud utilities (numpy/scipy; no Open3D dependency).

`compute_overlap` mirrors the reference semantics
(utils/pointcloud.py:8-65): a point is in the overlap region if the
other cloud has any point within `search_voxel_size`; correspondences
are mutual nearest-within-radius matches. The reference walks an Open3D
KD-tree point-by-point in python; here it is two vectorized
scipy cKDTree queries.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.spatial import cKDTree


def nearest_within_radius(queries: np.ndarray, supports: np.ndarray,
                          radius: float, use_native: bool = True) -> np.ndarray:
    """Index of the nearest support within radius for each query
    (-1 if none). Uses the C++ hash-grid (csrc/) when available,
    otherwise scipy's cKDTree."""
    if use_native:
        try:
            from .. import native
            if native.available():
                return native.nearest_within_radius(
                    queries.astype(np.float32), supports.astype(np.float32),
                    radius).astype(np.int64)
        except Exception:  # noqa: BLE001 — fall through to scipy
            pass
    tree = cKDTree(supports)
    dist, idx = tree.query(queries, k=1, distance_upper_bound=radius)
    idx = idx.astype(np.int64)
    idx[~np.isfinite(dist)] = -1
    idx[idx >= supports.shape[0]] = -1
    return idx


def compute_overlap(src: np.ndarray, tgt: np.ndarray,
                    search_voxel_size: float
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (src_in_overlap, tgt_in_overlap, src_tgt_corr (2, K))."""
    src_corr = nearest_within_radius(src, tgt, search_voxel_size)
    tgt_corr = nearest_within_radius(tgt, src, search_voxel_size)

    has_src = src_corr >= 0
    has_tgt = tgt_corr >= 0

    # mutual matches (reference additionally requires src_corr > 0 — an
    # off-by-one quirk that drops matches onto target index 0; we use >= 0)
    safe = np.where(has_src, src_corr, 0)
    mutual = has_src & (tgt_corr[safe] == np.arange(src.shape[0]))
    src_tgt_corr = np.stack([np.nonzero(mutual)[0], src_corr[mutual]])
    return has_src, has_tgt, src_tgt_corr
