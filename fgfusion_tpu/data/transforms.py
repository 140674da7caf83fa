"""Training augmentations for scan pairs (3DMatch / MCD style), pure
numpy with explicit Generators (no global random state).

Reference: data_loaders/transforms.py — RigidPerturb, Jitter,
ShufflePoints, RandomSwap, applied in that order
(data_loaders/__init__.py:19-24). Samples here are dicts with numpy
'src_xyz' (N,3), 'tgt_xyz' (M,3), 'pose' (3,4), optional
'src_overlap'/'tgt_overlap' (bool), 'correspondences' (2,K).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..geometry import se3_np


class RigidPerturb:
    """Random rigid perturbation of source OR target; 'small' is
    centroid-centered (reference transforms.py:15-72)."""

    def __init__(self, perturb_mode: str = "small"):
        assert perturb_mode in ("none", "small", "large")
        self.mode = perturb_mode

    def __call__(self, data: Dict, rng: np.random.Generator) -> Dict:
        if self.mode == "none":
            return data
        perturb = (se3_np.sample_pose_small(rng, std=0.1) if self.mode == "small"
                   else se3_np.sample_pose_large(rng))
        perturb_source = rng.random() > 0.5

        if self.mode == "small":
            cloud = data["src_xyz"] if perturb_source else data["tgt_xyz"]
            centroid = cloud.mean(axis=0, keepdims=True).T  # (3,1)
            center = se3_np.se3_init(None, -centroid.astype(np.float32))
            perturb = se3_np.se3_cat(
                se3_np.se3_cat(se3_np.se3_inv(center), perturb), center)

        if perturb_source:
            data["pose"] = se3_np.se3_cat(data["pose"], se3_np.se3_inv(perturb))
            data["src_xyz"] = se3_np.se3_transform(perturb, data["src_xyz"])
        else:
            data["pose"] = se3_np.se3_cat(perturb, data["pose"])
            data["tgt_xyz"] = se3_np.se3_transform(perturb, data["tgt_xyz"])
        return data


class Jitter:
    """Gaussian noise on both clouds (reference transforms.py:75-92)."""

    def __init__(self, scale: float):
        self.scale = scale

    def __call__(self, data: Dict, rng: np.random.Generator) -> Dict:
        for key in ("src_xyz", "tgt_xyz"):
            noise = rng.normal(scale=self.scale, size=data[key].shape)
            data[key] = (data[key] + noise).astype(np.float32)
        return data


class ShufflePoints:
    """Random permutation + cap at max_pts points per cloud, with
    correspondence reindexing (reference transforms.py:95-131)."""

    def __init__(self, max_pts: int = 30000):
        self.max_pts = max_pts

    def __call__(self, data: Dict, rng: np.random.Generator) -> Dict:
        perms = {}
        for side in ("src", "tgt"):
            n = data[f"{side}_xyz"].shape[0]
            take = min(n, self.max_pts)
            perm = rng.permutation(n)[:take]
            data[f"{side}_xyz"] = data[f"{side}_xyz"][perm]
            if f"{side}_overlap" in data:
                data[f"{side}_overlap"] = data[f"{side}_overlap"][perm]
            inv = np.full(n, -1, np.int64)
            inv[perm] = np.arange(take)
            perms[side] = inv
        if "correspondences" in data:
            corr = data["correspondences"]
            corr = np.stack([perms["src"][corr[0]], perms["tgt"][corr[1]]])
            data["correspondences"] = corr[:, np.all(corr >= 0, axis=0)]
        return data


class RandomSwap:
    """Swap src and tgt with p=0.5, inverting the pose
    (reference transforms.py:134-151)."""

    def __call__(self, data: Dict, rng: np.random.Generator) -> Dict:
        if rng.random() > 0.5:
            data["src_xyz"], data["tgt_xyz"] = data["tgt_xyz"], data["src_xyz"]
            if "src_overlap" in data:
                data["src_overlap"], data["tgt_overlap"] = (
                    data["tgt_overlap"], data["src_overlap"])
            if "correspondences" in data:
                data["correspondences"] = data["correspondences"][::-1].copy()
            data["pose"] = se3_np.se3_inv(data["pose"])
        return data


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, data: Dict, rng: np.random.Generator) -> Dict:
        for t in self.transforms:
            data = t(data, rng)
        return data


def train_transforms(cfg) -> Compose:
    """RigidPerturb -> Jitter -> ShufflePoints -> RandomSwap
    (reference data_loaders/__init__.py:19-24)."""
    return Compose([
        RigidPerturb(cfg.get("perturb_pose", "small")),
        Jitter(cfg.get("augment_noise", 0.005)),
        ShufflePoints(cfg.get("max_pts", 30000)),
        RandomSwap(),
    ])
