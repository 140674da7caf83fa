"""DGR-style 3DMatch evaluation (alternative protocol): a pair succeeds
if RRE < 15 deg and RTE < 0.3 m on the *inverse* trajectories.

Reference: benchmark/benchmark_3dmatch.py:105-176 (benchmark_dgr). Note
the reference compares est_traj[i] against gt_traj[i] positionally —
it assumes est.log pairs are written in gt.log order; we match pairs by
(i, j) indices instead, falling back to positional when indices are
absent.
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from .benchmark_3dmatch_rr import (SCENE_SHORT_NAMES, read_trajectory,
                                   rotation_error_deg)


def benchmark_dgr(est_folder: str, gt_folder: str, re_thres: float = 15.0,
                  te_thres: float = 0.3) -> Tuple[str, float]:
    scenes = sorted(os.listdir(gt_folder))
    all_success, all_rre, all_rte = [], [], []

    lines = ["Scene\t| success\t| rre\t| rte\t| rre_all\t| rte_all"]
    for s_idx, scene in enumerate(scenes):
        gt_pairs, gt_traj = read_trajectory(os.path.join(gt_folder, scene, "gt.log"))
        est_pairs, est_traj = read_trajectory(
            os.path.join(est_folder, scene, "est.log"))

        gt_lookup = {(int(p[0]), int(p[1])): i
                     for i, p in enumerate(gt_pairs.astype(np.int64))}
        success, rre_s, rte_s, rre_a, rte_a = [], [], [], [], []
        for i, pair in enumerate(est_pairs.astype(np.int64)):
            g = gt_lookup.get((int(pair[0]), int(pair[1])), i)
            est_inv = np.linalg.inv(est_traj[i])
            gt_inv = np.linalg.inv(gt_traj[g])
            rre = float(rotation_error_deg(est_inv[None, :3, :3],
                                           gt_inv[None, :3, :3])[0])
            rte = float(np.linalg.norm(est_inv[:3, 3] - gt_inv[:3, 3]))
            rre_a.append(rre)
            rte_a.append(rte)
            ok = rre < re_thres and rte < te_thres
            success.append(ok)
            if ok:
                rre_s.append(rre)
                rte_s.append(rte)

        short = SCENE_SHORT_NAMES[s_idx] if s_idx < len(SCENE_SHORT_NAMES) else scene
        lines.append(
            f"{short}\t| {np.mean(success):.3f}\t| {np.mean(rre_s or [np.nan]):.3f}"
            f"\t| {np.mean(rte_s or [np.nan]):.3f}\t| {np.mean(rre_a):.3f}"
            f"\t| {np.mean(rte_a):.3f}")
        all_success += success
        all_rre += rre_a
        all_rte += rte_a

    mean_success = float(np.mean(all_success))
    lines.append(f"Avg\t| {mean_success:.3f}\t| -\t| -\t| "
                 f"{np.mean(all_rre):.3f}\t| {np.mean(all_rte):.3f}")
    return "\n".join(lines), mean_success
