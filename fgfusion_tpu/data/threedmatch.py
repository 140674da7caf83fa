"""3DMatch / 3DLoMatch dataset (Predator-format).

Reference: data_loaders/threedmatch.py. Reads
`datasets/3dmatch/{phase}[_{benchmark}]_info.pkl` (dict of lists: rot /
trans / src / tgt / overlap) and per-fragment `.pth` clouds from the
Predator data root. Overlap masks come from the precomputed
`*_pairs-overlapmask.h5` if present, otherwise from an on-the-fly
mutual radius search (utils.pointcloud.compute_overlap).
"""
from __future__ import annotations

import logging
import os
import pickle
from typing import Dict, Optional

import numpy as np

from ..geometry import se3_np
from ..utils.pointcloud import compute_overlap

_logger = logging.getLogger(__name__)


def _load_cloud(path: str) -> np.ndarray:
    if path.endswith(".pth"):
        import torch  # host-side IO only; the compute path is JAX
        return np.asarray(torch.load(path, weights_only=False), dtype=np.float32)
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    raise ValueError(f"unsupported cloud format: {path}")


class ThreeDMatchDataset:
    def __init__(self, cfg, phase: str, transforms=None,
                 info_dir: Optional[str] = None):
        assert phase in ("train", "val", "test")
        if info_dir is None:
            info_dir = cfg.get("info_dir", "datasets/3dmatch")
        benchmark = cfg.get("benchmark")
        if phase in ("train", "val"):
            # cfg train_pkl/val_pkl select an alternate pair band, e.g.
            # the low-overlap curriculum band train_cur emitted by
            # tools/make_synthetic_3dmatch.py --lo_overlap.
            pkl = cfg.get(f"{phase}_pkl", phase)
            info_fname = os.path.join(info_dir, f"{pkl}_info.pkl")
            pairs_fname = f"{pkl}_pairs-overlapmask.h5"
        else:
            info_fname = os.path.join(info_dir, f"{phase}_{benchmark}_info.pkl")
            pairs_fname = f"{phase}_{benchmark}_pairs-overlapmask.h5"

        with open(info_fname, "rb") as f:
            self.infos = pickle.load(f)

        roots = [cfg["root"]] if isinstance(cfg["root"], str) else list(cfg["root"])
        self.base_dir = next((r for r in roots
                              if os.path.exists(os.path.join(r, "train"))), None)
        if self.base_dir is None:
            raise FileNotFoundError(f"3DMatch data root not found in {roots}")

        pairs_path = os.path.join(self.base_dir, pairs_fname)
        self.pairs_data = None
        if os.path.exists(pairs_path):
            import h5py
            self.pairs_data = h5py.File(pairs_path, "r")
        else:
            _logger.warning(
                "Overlap masks not precomputed; falling back to on-the-fly "
                "radius search (run tools/compute_overlap_3dmatch.py to cache)")

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

        if self.pairs_data is not None:
            src_ov = np.asarray(self.pairs_data[f"pair_{item:06d}/src_mask"])
            tgt_ov = np.asarray(self.pairs_data[f"pair_{item:06d}/tgt_mask"])
            corr = np.asarray(self.pairs_data[f"pair_{item:06d}/src_tgt_corr"])
        else:
            src_ov, tgt_ov, corr = compute_overlap(
                se3_np.se3_transform(pose, src_xyz), tgt_xyz,
                self.search_voxel_size)

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
            "overlap_p": self.infos["overlap"][item],
        }
        if self.transforms is not None:
            data = self.transforms(
                data, rng if rng is not None else np.random.default_rng())
        return data
