"""Bucketed fixed-shape collation.

The reference keeps ragged python lists all the way into the model
(collate_functions.py:4-22). XLA wants static shapes, so here each pair
is padded to a bucket capacity N0 (per-dataset config), and the pyramid
capacities for the deeper levels are derived from the voxel-size
schedule. A handful of buckets bounds recompilation; a single bucket is
the default.

Padding convention: padded coordinates = 1e6 (so any radius search
misses them), masks mark validity, overlap targets are 0 on padding.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import numpy as np


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def capacity_schedule(n0: int, num_levels: int, factor: float = 2.5,
                      floor: int = 64) -> List[int]:
    """Per-level capacities. Surface scans subsample ~3-4x per octave
    (cell doubles, surfaces are 2-manifolds); factor=2.5 adds headroom.
    Use ops.calibration to measure a tight schedule for a dataset."""
    caps = [n0]
    for _ in range(1, num_levels):
        caps.append(max(floor, round_up(int(math.ceil(caps[-1] / factor)), 64)))
    return caps


def pad_cloud(xyz: np.ndarray, n0: int, overlap: Optional[np.ndarray] = None,
              rng: Optional[np.random.Generator] = None):
    """Pad (or subsample, if oversized) one cloud to n0 points."""
    n = xyz.shape[0]
    if n > n0:
        sel = (rng.permutation(n)[:n0] if rng is not None
               else np.linspace(0, n - 1, n0).astype(np.int64))
        xyz = xyz[sel]
        overlap = overlap[sel] if overlap is not None else None
        n = n0
    out = np.full((n0, 3), 1e6, np.float32)
    out[:n] = xyz[:, :3]
    mask = np.zeros(n0, bool)
    mask[:n] = True
    ov = np.zeros(n0, np.float32)
    if overlap is not None:
        ov[:n] = overlap.astype(np.float32)
    return out, mask, ov


def collate_pairs(samples: Sequence[Dict], n0: int,
                  rng: Optional[np.random.Generator] = None) -> Dict[str, np.ndarray]:
    """Stack a list of pair dicts into fixed-shape batch arrays.

    Fixed-shape analogue of reference collate_pair
    (collate_functions.py:4-22): ragged fields become padded (B, N0, .)
    arrays + masks; 'pose' stacks to (B, 3, 4).
    """
    b = len(samples)
    out = {
        "src_xyz": np.empty((b, n0, 3), np.float32),
        "tgt_xyz": np.empty((b, n0, 3), np.float32),
        "src_mask": np.empty((b, n0), bool),
        "tgt_mask": np.empty((b, n0), bool),
        "src_overlap": np.zeros((b, n0), np.float32),
        "tgt_overlap": np.zeros((b, n0), np.float32),
        "pose": np.empty((b, 3, 4), np.float32),
    }
    for i, s in enumerate(samples):
        out["src_xyz"][i], out["src_mask"][i], out["src_overlap"][i] = pad_cloud(
            s["src_xyz"], n0, s.get("src_overlap"), rng)
        out["tgt_xyz"][i], out["tgt_mask"][i], out["tgt_overlap"][i] = pad_cloud(
            s["tgt_xyz"], n0, s.get("tgt_overlap"), rng)
        out["pose"][i] = s["pose"]
    return out
