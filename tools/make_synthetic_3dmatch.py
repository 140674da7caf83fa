#!/usr/bin/env python3
"""Synthetic 3DMatch-format dataset (Predator layout).

This machine has no network egress, so the real Predator 3DMatch root
cannot be downloaded. This tool builds a format-identical synthetic
stand-in so the FULL 3DMatch path — ThreeDMatchDataset pkl/pth loading,
overlap-mask h5 cache, 16k-bucket training, est.log writing, and the
official Redwood RR protocol (gt.log + gt.info) — runs end to end and
produces a real (clearly-synthetic-data) registration-recall number.

Scenes are procedural rooms (floor, walls, random boxes / cylinders /
spheres, surface-sampled). Fragments are spherical views of the scene,
voxel-thinned to ~2.5 cm density, expressed in random local frames;
the GT pair pose maps src-local to tgt-local coordinates. gt.info
holds the official information matrix sum_p G_p^T G_p with
G_p = [I | 2 [x]_x-style block] over the target fragment's overlap
points, so the protocol's covariance-weighted error equals the mean
squared per-point alignment error (success = RMSE <= 0.2 m), exactly
as on the real benchmark (benchmark/benchmark_predator.py lineage).

Outputs under datasets/3dmatch_synth/:
    data/{train,test}/scene_XXXX/cloud_bin_N.pth
    data/{train,val,test_3DMatch,test_3DLoMatch}_pairs-overlapmask.h5
    {train,val}_info.pkl  test_{3DMatch,3DLoMatch}_info.pkl
    benchmarks/{3DMatch,3DLoMatch}/scene_XXXX/gt.{log,info}
(.pth/.h5 are regenerable and gitignored; run this tool first.)
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fgfusion_tpu.geometry import se3_np  # noqa: E402
from fgfusion_tpu.utils.pointcloud import compute_overlap  # noqa: E402

VOXEL = 0.025
OVERLAP_RADIUS = 0.0375


# ---------------------------------------------------------------------------
# surface sampling primitives
# ---------------------------------------------------------------------------

def _plane(rng, origin, u, v, density):
    area = np.linalg.norm(np.cross(u, v))
    n = max(int(area * density), 8)
    a = rng.random((n, 1))
    b = rng.random((n, 1))
    return origin + a * u + b * v


def _box(rng, center, size, density):
    faces = []
    sx, sy, sz = size
    for axis in range(3):
        for side in (0.0, 1.0):
            dims = [d for d in range(3) if d != axis]
            origin = center - size / 2
            origin = origin + side * size * np.eye(3)[axis]
            u = np.eye(3)[dims[0]] * size[dims[0]]
            v = np.eye(3)[dims[1]] * size[dims[1]]
            faces.append(_plane(rng, origin, u, v, density))
    return np.concatenate(faces)


def _sphere(rng, center, radius, density):
    n = max(int(4 * np.pi * radius ** 2 * density), 16)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return center + radius * d


def _cylinder(rng, center, radius, height, density):
    n = max(int(2 * np.pi * radius * height * density), 16)
    theta = rng.random(n) * 2 * np.pi
    z = (rng.random(n) - 0.5) * height
    return center + np.stack([radius * np.cos(theta),
                              radius * np.sin(theta), z], axis=1)


def make_scene(rng, density=2400.0):
    """A room: floor + 3 walls + 4-8 random objects. ~3.2 x 3.2 x 2.4 m."""
    w, d, h = 3.2, 3.2, 2.4
    pts = [
        _plane(rng, np.zeros(3), np.array([w, 0, 0]), np.array([0, d, 0]),
               density),                                        # floor
        _plane(rng, np.zeros(3), np.array([w, 0, 0]), np.array([0, 0, h]),
               density),                                        # wall y=0
        _plane(rng, np.zeros(3), np.array([0, d, 0]), np.array([0, 0, h]),
               density),                                        # wall x=0
        _plane(rng, np.array([0, d, 0]), np.array([w, 0, 0]),
               np.array([0, 0, h]), density),                   # wall y=d
    ]
    for _ in range(rng.integers(4, 9)):
        kind = rng.integers(3)
        c = np.array([rng.uniform(0.4, w - 0.4), rng.uniform(0.4, d - 0.4),
                      rng.uniform(0.2, 1.2)])
        if kind == 0:
            pts.append(_box(rng, c, rng.uniform(0.25, 0.9, 3), density))
        elif kind == 1:
            pts.append(_sphere(rng, c, rng.uniform(0.15, 0.4), density))
        else:
            pts.append(_cylinder(rng, c, rng.uniform(0.1, 0.3),
                                 rng.uniform(0.4, 1.2), density))
    return np.concatenate(pts).astype(np.float32)


def voxel_thin(pts, cell, rng):
    """Keep one random point per cell (approximates scan density)."""
    keys = np.floor(pts / cell).astype(np.int64)
    order = rng.permutation(len(pts))
    _, first = np.unique(keys[order], axis=0, return_index=True)
    return pts[order[np.sort(first)]]


def make_fragment(rng, scene, radius_range=(1.4, 1.9), noise=0.004):
    """Spherical view of the scene in a random local frame."""
    center = scene[rng.integers(len(scene))]
    radius = rng.uniform(*radius_range)
    sel = scene[np.linalg.norm(scene - center, axis=1) < radius]
    sel = voxel_thin(sel, VOXEL, rng)
    sel = sel + rng.normal(scale=noise, size=sel.shape)
    # local frame: fragment pose (R_i, t_i); stored cloud is
    # x_local = R_i^T (x_world - t_i). Rotation fully random
    # (Predator-style), origin near the view center like a camera frame.
    rot = se3_np.sample_pose_large(rng)[:3, :3]
    t = center + rng.uniform(-0.5, 0.5, size=3)
    local = (sel - t) @ rot
    return local.astype(np.float32), rot, t


def pair_pose(rot_i, t_i, rot_j, t_j):
    """SE3 mapping fragment-i local coords to fragment-j local coords."""
    rot = rot_j.T @ rot_i
    t = rot_j.T @ (t_i - t_j)
    return np.concatenate([rot, t[:, None]], axis=1).astype(np.float32)


def overlap_ratio(src, tgt, pose):
    from scipy.spatial import cKDTree
    aligned = se3_np.se3_transform(pose, src)
    d, _ = cKDTree(tgt).query(aligned, k=1,
                              distance_upper_bound=OVERLAP_RADIUS)
    return float(np.mean(np.isfinite(d)))


def gt_info_matrix(tgt_overlap_pts):
    """Official Redwood information matrix: sum_p G^T G with
    G = [[1,0,0,  0, 2z,-2y], [0,1,0,-2z, 0, 2x], [0,0,1, 2y,-2x, 0]]
    over the target fragment's overlap points."""
    x, y, z = (tgt_overlap_pts[:, 0], tgt_overlap_pts[:, 1],
               tgt_overlap_pts[:, 2])
    n = len(x)
    g = np.zeros((n, 3, 6))
    g[:, 0, 0] = g[:, 1, 1] = g[:, 2, 2] = 1.0
    g[:, 0, 4] = 2 * z
    g[:, 0, 5] = -2 * y
    g[:, 1, 3] = -2 * z
    g[:, 1, 5] = 2 * x
    g[:, 2, 3] = 2 * y
    g[:, 2, 4] = -2 * x
    return np.einsum("nij,nik->jk", g, g)


# ---------------------------------------------------------------------------

def build_split(root, split_dir, scene_ids, n_frag, rng, h5_prefixes):
    """Generate scenes+fragments, return per-benchmark pair infos."""
    import h5py
    import torch

    infos = {name: {"rot": [], "trans": [], "src": [], "tgt": [],
                    "overlap": []} for name in h5_prefixes}
    gt = {name: {} for name in h5_prefixes}  # scene -> (pairs, poses, infos)

    h5 = {name: h5py.File(os.path.join(root, "data",
                                       f"{name}_pairs-overlapmask.h5"), "w")
          for name in h5_prefixes}
    counters = {name: 0 for name in h5_prefixes}

    for sid in scene_ids:
        scene_name = f"scene_{sid:04d}"
        srng = np.random.default_rng((123, sid))
        scene = make_scene(srng)
        out_dir = os.path.join(root, "data", split_dir, scene_name)
        os.makedirs(out_dir, exist_ok=True)

        frags, rots, ts = [], [], []
        for i in range(n_frag):
            f, r, t = make_fragment(srng, scene)
            frags.append(f)
            rots.append(r)
            ts.append(t)
            torch.save(f, os.path.join(out_dir, f"cloud_bin_{i}.pth"))

        for j in range(n_frag):          # tgt
            for i in range(j + 1, n_frag):  # src (> tgt, like Predator)
                pose = pair_pose(rots[i], ts[i], rots[j], ts[j])
                ov = overlap_ratio(frags[i], frags[j], pose)
                masks = None  # computed once per pair, shared across bands
                for name, (lo, hi) in h5_prefixes.items():
                    if not (lo <= ov < hi):
                        continue
                    item = counters[name]
                    counters[name] += 1
                    infos[name]["rot"].append(pose[:3, :3])
                    infos[name]["trans"].append(pose[:3, 3:4])
                    infos[name]["src"].append(
                        f"{split_dir}/{scene_name}/cloud_bin_{i}.pth")
                    infos[name]["tgt"].append(
                        f"{split_dir}/{scene_name}/cloud_bin_{j}.pth")
                    infos[name]["overlap"].append(ov)

                    if masks is None:
                        masks = compute_overlap(
                            se3_np.se3_transform(pose, frags[i]), frags[j],
                            OVERLAP_RADIUS)
                    src_ov, tgt_ov, corr = masks
                    grp = h5[name].create_group(f"pair_{item:06d}")
                    grp["src_mask"] = src_ov
                    grp["tgt_mask"] = tgt_ov
                    grp["src_tgt_corr"] = corr

                    pose44 = np.eye(4)
                    pose44[:3] = pose
                    gt[name].setdefault(scene_name, []).append(
                        ((j, i), pose44, gt_info_matrix(frags[j][tgt_ov])))

    for f in h5.values():
        f.close()
    return infos, gt, {s: n_frag for s in
                       [f"scene_{sid:04d}" for sid in scene_ids]}


def write_benchmark(root, bench_name, gt, n_frag_by_scene):
    for scene, entries in gt.items():
        d = os.path.join(root, "benchmarks", bench_name, scene)
        os.makedirs(d, exist_ok=True)
        n_frag = n_frag_by_scene[scene]
        with open(os.path.join(d, "gt.log"), "w") as flog, \
                open(os.path.join(d, "gt.info"), "w") as finfo:
            for (j, i), pose44, info in entries:
                flog.write(f"{j}\t{i}\t{n_frag}\n")
                for row in pose44:
                    flog.write("\t".join(f"{v:.12f}" for v in row) + "\n")
                finfo.write(f"{j}\t{i}\t{n_frag}\n")
                for row in info:
                    finfo.write("\t".join(f"{v:.12e}" for v in row) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets/3dmatch_synth")
    ap.add_argument("--train_scenes", type=int, default=16)
    ap.add_argument("--val_scenes", type=int, default=2)
    ap.add_argument("--test_scenes", type=int, default=3)
    ap.add_argument("--frags", type=int, default=8)
    ap.add_argument("--lo_overlap", type=float, nargs="+", default=None,
                    help="if set (e.g. 0.10), ALSO emit a curriculum band "
                         "train_cur_info.pkl with pairs in "
                         "[lo_overlap, 1.01) — the Predator-protocol "
                         "train band (>0.30) is emitted unchanged; point "
                         "a config's train_pkl: train_cur at it to train "
                         "with low-overlap pairs included. Extra values "
                         "emit extra bands named train_curNN (NN = "
                         "100*lo), e.g. '--lo_overlap 0.10 0.05' adds "
                         "train_cur05 with pairs in [0.05, 1.01). Bands "
                         "never consume RNG (scene/fragment streams are "
                         "seeded per scene), so adding one leaves every "
                         "other emitted file bit-identical.")
    args = ap.parse_args()

    root = args.root
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    rng = np.random.default_rng(0)

    # train + val: overlap > 0.30 only (Predator train protocol);
    # optional train_cur curriculum band includes low-overlap pairs.
    train_bands = {"train": (0.30, 1.01)}
    for idx, lo in enumerate(args.lo_overlap or []):
        name = ("train_cur" if idx == 0
                else f"train_cur{int(round(lo * 100)):02d}")
        train_bands[name] = (lo, 1.01)
    tr_infos, _, _ = build_split(
        root, "train", range(args.train_scenes), args.frags, rng,
        train_bands)
    for name in train_bands:
        with open(os.path.join(root, f"{name}_info.pkl"), "wb") as f:
            pickle.dump(tr_infos[name], f)

    val_infos, _, _ = build_split(
        root, "train", range(1000, 1000 + args.val_scenes), args.frags, rng,
        {"val": (0.30, 1.01)})
    with open(os.path.join(root, "val_info.pkl"), "wb") as f:
        pickle.dump(val_infos["val"], f)

    # test: 3DMatch (>0.3) and 3DLoMatch (0.1-0.3), same scenes
    te_infos, te_gt, n_by_scene = build_split(
        root, "test", range(2000, 2000 + args.test_scenes), args.frags, rng,
        {"test_3DMatch": (0.30, 1.01), "test_3DLoMatch": (0.10, 0.30)})
    for bench in ("3DMatch", "3DLoMatch"):
        with open(os.path.join(root, f"test_{bench}_info.pkl"), "wb") as f:
            pickle.dump(te_infos[f"test_{bench}"], f)
        write_benchmark(root, bench, te_gt[f"test_{bench}"], n_by_scene)

    for name, infos in ([(n, tr_infos[n]) for n in train_bands]
                        + [("val", val_infos["val"]),
                           ("test/3DMatch", te_infos["test_3DMatch"]),
                           ("test/3DLoMatch", te_infos["test_3DLoMatch"])]):
        print(f"{name}: {len(infos['rot'])} pairs")


if __name__ == "__main__":
    main()
