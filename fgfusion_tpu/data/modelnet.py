"""ModelNet40 HDF5 dataset with RPMNet-style partial-view generation.

Reference: data_loaders/modelnet.py + modelnet_transforms.py. The
pipeline (noise_type='crop', the benchmark config) per sample:
  raw 2048-pt cloud (xyz+normals)
  -> split into identical src/ref copies with identity correspondences
  -> RandomCrop: half-space crop of each cloud at keep-percentile
     p_keep, overlap masks from surviving correspondences
  -> RandomTransformSE3_euler on the source (gt pose = inverse)
  -> Resampler to num_points (with the Predator-era 717/717 quirk for
     two-sided crops, kept for parity —
     modelnet_transforms.py:92-94)
  -> RandomJitter (sigma 0.01, clip 0.05)
  -> ShufflePoints
Test determinism: per-item seed = sample index
(modelnet_transforms.py:400-405 SetDeterministic + np.random.seed(idx)).

Implemented with numpy Generators; the deterministic test path seeds a
fresh Generator with the item index, which plays the role of
SetDeterministic.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..geometry import se3_np


def uniform_2_sphere(rng: np.random.Generator) -> np.ndarray:
    phi = rng.uniform(0.0, 2 * np.pi)
    cos_theta = rng.uniform(-1.0, 1.0)
    sin_theta = np.sqrt(max(0.0, 1 - cos_theta ** 2))
    return np.array([sin_theta * np.cos(phi), sin_theta * np.sin(phi), cos_theta])


def crop_halfspace(points: np.ndarray, p_keep: float, rng: np.random.Generator):
    """Keep points on one side of a random plane through the centroid,
    shifted to retain ~p_keep of the cloud
    (reference modelnet_transforms.py:188-199)."""
    direction = uniform_2_sphere(rng)
    centered = points[:, :3] - points[:, :3].mean(axis=0)
    dist = centered @ direction
    if p_keep == 0.5:
        mask = dist > 0
    else:
        mask = dist > np.percentile(dist, (1.0 - p_keep) * 100)
    return points[mask], mask


def resample(points: np.ndarray, k: int, rng: np.random.Generator):
    """No repeats if k <= N; every point at least once otherwise
    (reference modelnet_transforms.py:117-133)."""
    n = points.shape[0]
    if k <= n:
        idx = rng.choice(n, k, replace=False)
    else:
        idx = np.concatenate([rng.permutation(n),
                              rng.choice(n, k - n, replace=True)])
    return points[idx], idx


class ModelNetPairGenerator:
    """Turns one raw cloud into a registration pair. Stateless w.r.t.
    global RNG; pass a Generator per call."""

    def __init__(self, noise_type: str = "crop", rot_mag: float = 45.0,
                 trans_mag: float = 0.5, num_points: int = 1024,
                 partial: Optional[List[float]] = None,
                 jitter_scale: float = 0.01, jitter_clip: float = 0.05):
        self.noise_type = noise_type
        self.rot_mag = rot_mag
        self.trans_mag = trans_mag
        self.num_points = num_points
        self.partial = list(partial) if partial is not None else [0.7, 0.7]
        self.jitter_scale = jitter_scale
        self.jitter_clip = jitter_clip

    # -- pieces ---------------------------------------------------------
    def _random_se3_euler(self, rng) -> np.ndarray:
        """Euler-angle rotation, each angle uniform in [0, rot_mag] deg
        (DCP convention — reference modelnet_transforms.py:325-355)."""
        ax, ay, az = rng.uniform(size=3) * np.pi * self.rot_mag / 180.0
        cx, cy, cz = np.cos([ax, ay, az])
        sx, sy, sz = np.sin([ax, ay, az])
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        rot = rx @ ry @ rz
        trans = rng.uniform(-self.trans_mag, self.trans_mag, 3)
        return np.concatenate([rot, trans[:, None]], axis=1).astype(np.float32)

    def _jitter(self, pts, rng):
        noise = np.clip(rng.normal(0.0, self.jitter_scale, (pts.shape[0], 3)),
                        -self.jitter_clip, self.jitter_clip)
        pts = pts.copy()
        pts[:, :3] += noise
        return pts

    # -- full pipeline ---------------------------------------------------
    def __call__(self, raw_points: np.ndarray, rng: np.random.Generator) -> Dict:
        src = raw_points.copy()
        ref = raw_points.copy()
        n = raw_points.shape[0]
        corr = np.tile(np.arange(n), (2, 1))
        crop_sizes = None

        if self.noise_type == "crop" and not all(p == 1.0 for p in self.partial):
            # src cropped with p_keep[0], ref with p_keep[1]. NB the
            # reference (modelnet_transforms.py:216-217) crops ref with
            # p_keep[0] — a quirk inherited from REGTR that diverges
            # from RPMNet's original p_keep[1]; identical for every
            # shipped (symmetric) config, we use the correct index.
            # A 1-element p_keep crops only src
            # (modelnet_transforms.py:211-214).
            src, src_mask = crop_halfspace(src, self.partial[0], rng)
            if len(self.partial) == 1:
                ref_mask = np.ones(n, bool)
            else:
                ref, ref_mask = crop_halfspace(ref, self.partial[1], rng)
            # overlap = has surviving correspondence on the other side
            src_ov = np.zeros(n, bool)
            src_ov[corr[0][ref_mask[corr[1]]]] = True
            src_ov = src_ov[src_mask]
            ref_ov = np.zeros(n, bool)
            ref_ov[corr[1][src_mask[corr[0]]]] = True
            ref_ov = ref_ov[ref_mask]
            src_map = np.full(n, -1); src_map[src_mask] = np.arange(src_mask.sum())
            ref_map = np.full(n, -1); ref_map[ref_mask] = np.arange(ref_mask.sum())
            corr = np.stack([src_map[corr[0]], ref_map[corr[1]]])
            corr = corr[:, np.all(corr >= 0, axis=0)]
            if len(self.partial) == 1:
                # src-only crop: resample src to ceil(p0*num), ref to num
                # (reference modelnet_transforms.py:86-88)
                import math
                crop_sizes = (math.ceil(self.partial[0] * self.num_points),
                              self.num_points)
            else:
                crop_sizes = (717, 717)  # Predator-parity resample size
        else:
            src_ov = np.ones(n, bool)
            ref_ov = np.ones(n, bool)

        # transform source; gt pose maps src -> ref
        igt = self._random_se3_euler(rng)
        src_xyz = se3_np.se3_transform(igt, src[:, :3])
        if src.shape[1] == 6:
            normals = src[:, 3:6] @ igt[:3, :3].T
            src = np.concatenate([src_xyz, normals], axis=1)
        else:
            src = src_xyz
        pose_gt = se3_np.se3_inv(igt)

        # resample
        if self.noise_type != "clean":
            if crop_sizes is not None:
                s_size, r_size = crop_sizes
            else:
                s_size = r_size = self.num_points
            src_res, src_idx = resample(src, s_size, rng)
            ref_res, ref_idx = resample(ref, r_size, rng)
            src_map = np.full(src.shape[0], -1); src_map[src_idx] = np.arange(s_size)
            ref_map = np.full(ref.shape[0], -1); ref_map[ref_idx] = np.arange(r_size)
            corr = np.stack([src_map[corr[0]], ref_map[corr[1]]])
            corr = corr[:, np.all(corr >= 0, axis=0)]
            src, ref = src_res, ref_res
            src_ov, ref_ov = src_ov[src_idx], ref_ov[ref_idx]

        if self.noise_type in ("jitter", "crop"):
            src = self._jitter(src, rng)
            ref = self._jitter(ref, rng)

        # shuffle
        sp = rng.permutation(src.shape[0])
        rp = rng.permutation(ref.shape[0])
        src, ref = src[sp], ref[rp]
        src_ov, ref_ov = src_ov[sp], ref_ov[rp]
        src_map = np.full(len(sp), -1); src_map[sp] = np.arange(len(sp))
        ref_map = np.full(len(rp), -1); ref_map[rp] = np.arange(len(rp))
        corr = np.stack([src_map[corr[0]], ref_map[corr[1]]])

        return {
            "src_xyz": src[:, :3].astype(np.float32),
            "tgt_xyz": ref[:, :3].astype(np.float32),
            "tgt_raw": raw_points[:, :3].astype(np.float32),
            "src_overlap": src_ov,
            "tgt_overlap": ref_ov,
            "correspondences": corr,
            "pose": pose_gt,
        }


class ModelNetHdf:
    """HDF5-backed ModelNet40 (reference modelnet.py:124-231). Items are
    registration pairs generated on the fly; the test subset is
    deterministic per index."""

    def __init__(self, cfg, root: str, subset: str = "train",
                 categories: Optional[List[str]] = None, deterministic=False,
                 seed: int = 0):
        import h5py  # deferred: only needed when actually loading data

        self._root = root
        self.deterministic = deterministic
        self._seed = seed
        self.generator = ModelNetPairGenerator(
            noise_type=cfg.get("noise_type", "crop"),
            rot_mag=cfg.get("rot_mag", 45.0),
            trans_mag=cfg.get("trans_mag", 0.5),
            num_points=cfg.get("num_points", 1024),
            partial=cfg.get("partial", [0.7, 0.7]),
        )

        with open(os.path.join(root, "shape_names.txt")) as f:
            classes = [l.strip() for l in f]
        cat2idx = {c: i for i, c in enumerate(classes)}

        with open(os.path.join(root, f"{subset}_files.txt")) as f:
            files = [line.strip().replace("data/modelnet40_ply_hdf5_2048/", "")
                     for line in f]
        files = [os.path.join(root, os.path.basename(f)) for f in files]

        cat_idx = [cat2idx[c] for c in categories] if categories else None
        data, labels = [], []
        for fname in files:
            with h5py.File(fname, "r") as f:
                d = np.concatenate([f["data"][:], f["normal"][:]], axis=-1)
                l = f["label"][:].flatten().astype(np.int64)
            if cat_idx is not None:
                m = np.isin(l, cat_idx)
                d, l = d[m], l[m]
            data.append(d)
            labels.append(l)
        self._data = np.concatenate(data, axis=0).astype(np.float32)
        self._labels = np.concatenate(labels, axis=0)

    def __len__(self):
        return self._data.shape[0]

    def __getitem__(self, item: int, rng: Optional[np.random.Generator] = None) -> Dict:
        # test determinism: per-item seed (reference SetDeterministic +
        # np.random.seed(idx), modelnet_transforms.py:400-405)
        if self.deterministic or rng is None:
            rng = np.random.default_rng(item if self.deterministic
                                        else (self._seed, item))
        sample = self.generator(self._data[item], rng)
        sample["idx"] = np.int32(item)
        sample["label"] = self._labels[item]
        return sample


def read_category_file(path: str) -> List[str]:
    with open(path) as f:
        return sorted(line.rstrip("\n") for line in f)
