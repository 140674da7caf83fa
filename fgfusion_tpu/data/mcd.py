"""MCD outdoor LiDAR dataset.

Reference: data_loaders/mcd.py — identical shape to the 3DMatch loader
but with pkl name pattern `tuhh_night_09_mergeMiniGap_{phase}.pkl`
(mcd.py:24-29) and clouds stored as downsampled `.pth` files produced
by the MCD conversion pipeline (tools/mcd/*).
"""
from __future__ import annotations

import logging
import os
import pickle
from typing import Dict, Optional

import numpy as np

from ..geometry import se3_np
from ..utils.pointcloud import compute_overlap
from .threedmatch import _load_cloud

_logger = logging.getLogger(__name__)


class MCDDataset:
    def __init__(self, cfg, phase: str, transforms=None):
        assert phase in ("train", "val", "test")
        self.base_dir = cfg["root"]
        pkl_name = cfg.get(
            "mcd_pkl_pattern", "tuhh_night_09_mergeMiniGap_{phase}.pkl"
        ).format(phase=phase)
        with open(os.path.join(self.base_dir, pkl_name), "rb") as f:
            self.infos = pickle.load(f)
        self.search_voxel_size = cfg["overlap_radius"]
        self.transforms = transforms
        self.phase = phase

    def __len__(self) -> int:
        return len(self.infos["rot"])

    def __getitem__(self, item: int, rng: Optional[np.random.Generator] = None) -> Dict:
        pose = se3_np.se3_init(
            np.asarray(self.infos["rot"][item], np.float32),
            np.asarray(self.infos["trans"][item], np.float32).reshape(3, 1))
        src_path = self.infos["src"][item]
        tgt_path = self.infos["tgt"][item]
        src_xyz = _load_cloud(os.path.join(self.base_dir, src_path))
        tgt_xyz = _load_cloud(os.path.join(self.base_dir, tgt_path))

        src_ov, tgt_ov, corr = compute_overlap(
            se3_np.se3_transform(pose, src_xyz), tgt_xyz, self.search_voxel_size)

        data = {
            "src_xyz": src_xyz,
            "tgt_xyz": tgt_xyz,
            "src_overlap": src_ov,
            "tgt_overlap": tgt_ov,
            "correspondences": corr,
            "pose": pose,
            "idx": item,
            "src_path": src_path,
            "tgt_path": tgt_path,
            "overlap_p": self.infos.get("overlap", [1.0] * len(self))[item],
        }
        if self.transforms is not None:
            data = self.transforms(
                data, rng if rng is not None else np.random.default_rng())
        return data
