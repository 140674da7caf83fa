"""3DMatch / 3DLoMatch Registration Recall — the official
3DMatch/Redwood protocol, pure numpy.

Reference: benchmark/benchmark_predator.py (itself from Predator). The
protocol (http://redwood-data.org/indoor/registration.html):

- per scene, read `gt.log` (Redwood trajectory: header "i j n" + 4x4
  pose per pair) and `gt.info` (6x6 covariance of the transform params
  per pair);
- only NON-consecutive pairs (|i-j| > 1) count;
- a pair succeeds if the covariance-weighted transform error
  p = e^T Σ e / Σ[0,0] with e = [t, q_xyz] of gt⁻¹ ∘ est is <= 0.2²;
- report per-scene precision/recall, RE/TE statistics of successful
  pairs, and the n_valid-weighted global recall.

This re-implementation drops the torch/pandas/nibabel dependencies
(quaternion via scipy with the w>=0 convention nibabel uses) and keeps
the flag.npy / errors.npy side outputs.
"""
from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np
from scipy.spatial.transform import Rotation

SCENE_SHORT_NAMES = ["Kitchen", "Home 1", "Home 2", "Hotel 1", "Hotel 2",
                     "Hotel 3", "Study", "MIT Lab"]


# ---------------------------------------------------------------------------
# Redwood-format IO
# ---------------------------------------------------------------------------

def read_trajectory(path: str, dim: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (pairs (n, 3) str array, poses (n, 4, 4))."""
    with open(path) as f:
        lines = [l for l in f.readlines() if l.strip()]
    pairs, poses = [], []
    for i in range(0, len(lines), dim + 1):
        pairs.append([tok.strip() for tok in lines[i].split()[:3]])
        block = [np.fromstring(lines[i + 1 + r], sep="\t" if "\t" in lines[i + 1 + r] else " ")[:dim]
                 for r in range(dim)]
        poses.append(np.stack(block))
    return np.asarray(pairs), np.asarray(poses, dtype=np.float64)


def read_trajectory_info(path: str, dim: int = 6) -> Tuple[int, np.ndarray]:
    """Returns (n_fragments, covariances (n, 6, 6))."""
    with open(path) as f:
        lines = [l for l in f.readlines() if l.strip()]
    n_pairs = len(lines) // (dim + 1)
    covs = []
    n_frag = 0
    for i in range(n_pairs):
        head = lines[i * (dim + 1)].split()
        n_frag = int(head[2])
        rows = [np.fromstring(lines[i * (dim + 1) + 1 + r], sep="\t" if "\t" in lines[i * (dim + 1) + 1 + r] else " ")
                for r in range(dim)]
        covs.append(np.stack(rows))
    return n_frag, np.asarray(covs, dtype=np.float64)


def write_est_log(path: str, pairs: List[Tuple[int, int, int]],
                  poses: np.ndarray):
    """Write an est.log (Redwood format). poses: (n, 4, 4)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        for (i, j, n), pose in zip(pairs, poses):
            f.write(f"{i}\t{j}\t{n}\n")
            for row in pose:
                f.write("\t".join(f"{v:.12f}" for v in row) + "\n")


# ---------------------------------------------------------------------------
# Errors
# ---------------------------------------------------------------------------

def _mat2quat_wxyz(rot: np.ndarray) -> np.ndarray:
    q = Rotation.from_matrix(rot).as_quat()  # (x, y, z, w)
    q = np.concatenate([q[3:4], q[:3]])      # -> (w, x, y, z)
    return -q if q[0] < 0 else q             # w >= 0 convention


def transformation_error(trans: np.ndarray, info: np.ndarray) -> float:
    """Covariance-weighted squared transform error (RMSE proxy).
    trans: (4,4) relative transform gt⁻¹ ∘ est; info: (6,6)."""
    t = trans[:3, 3]
    q = _mat2quat_wxyz(trans[:3, :3])
    e = np.concatenate([t, q[1:]])
    return float(e @ info @ e / info[0, 0])


def rotation_error_deg(r_est: np.ndarray, r_gt: np.ndarray) -> np.ndarray:
    rel = np.einsum("nij,nik->njk", r_est, r_gt)  # estᵀ @ gt
    trace = rel[:, 0, 0] + rel[:, 1, 1] + rel[:, 2, 2]
    return np.degrees(np.arccos(np.clip((trace - 1) / 2, -1.0, 1.0)))


# ---------------------------------------------------------------------------
# Protocol
# ---------------------------------------------------------------------------

def evaluate_registration(n_fragments: int, est_traj: np.ndarray,
                          est_pairs: np.ndarray, gt_pairs: np.ndarray,
                          gt_traj: np.ndarray, gt_info: np.ndarray,
                          err_thresh: float = 0.2):
    """Per-scene precision/recall + per-pair flags and errors.
    flags: 0 = success, 1 = failure, 2 = not in the valid (non-
    consecutive) gt set."""
    err2 = err_thresh ** 2
    gt_index = {}
    for idx in range(gt_pairs.shape[0]):
        i, j = int(gt_pairs[idx, 0]), int(gt_pairs[idx, 1])
        if j - i > 1:
            gt_index[(i, j)] = idx
    n_gt = len(gt_index)

    flags = np.full(est_pairs.shape[0], 2, np.int64)
    errors = np.full(est_pairs.shape[0], np.nan)
    good = n_res = 0
    for idx in range(est_pairs.shape[0]):
        key = (int(est_pairs[idx, 0]), int(est_pairs[idx, 1]))
        if key not in gt_index:
            continue
        n_res += 1
        g = gt_index[key]
        rel = np.linalg.inv(gt_traj[g]) @ est_traj[idx]
        p = transformation_error(rel, gt_info[g])
        errors[idx] = p
        flags[idx] = 0 if p <= err2 else 1
        good += int(p <= err2)

    precision = good / max(n_res, 1)
    recall = good / max(n_gt, 1)
    return precision, recall, flags, errors, n_gt


def benchmark(est_folder: str, gt_folder: str, err_thresh: float = 0.2,
              with_details: bool = False, missing_ok: bool = False):
    """Full multi-scene benchmark. Returns (report string, mean recall),
    plus — with_details=True — a per-pair list of dicts
    {scene, tgt_idx, src_idx, success, error} over the valid
    (non-consecutive) gt set, for downstream breakdowns such as
    RR-vs-overlap-bin.

    missing_ok=True scores only the scenes that have an est.log —
    the partial-salvage mode for a budget-capped (gracefully stopped)
    eval sweep; the report then names the scenes skipped."""
    scenes = sorted(os.listdir(gt_folder))
    skipped = [s for s in scenes
               if not os.path.exists(os.path.join(est_folder, s, "est.log"))]
    if skipped:
        if not missing_ok:
            raise FileNotFoundError(
                f"no est.log for scenes {skipped} under {est_folder} "
                "(pass missing_ok=True to score a partial sweep)")
        scenes = [s for s in scenes if s not in skipped]
        if not scenes:
            return ("no scenes evaluated", 0.0, []) if with_details else \
                ("no scenes evaluated", 0.0)
    orig_idx = {s: i for i, s in enumerate(sorted(os.listdir(gt_folder)))}
    precisions, recalls, n_valids = [], [], []
    re_medians, te_medians = [], []
    details = []

    lines = ["Scene\t| prec.\t| rec.\t| re\t| te\t| samples"]
    for s_idx, scene in enumerate(scenes):
        gt_pairs, gt_traj = read_trajectory(os.path.join(gt_folder, scene, "gt.log"))
        n_fragments, gt_info = read_trajectory_info(
            os.path.join(gt_folder, scene, "gt.info"))
        est_pairs, est_traj = read_trajectory(
            os.path.join(est_folder, scene, "est.log"))

        prec, rec, flags, errors, n_valid = evaluate_registration(
            n_fragments, est_traj, est_pairs.astype(np.int64),
            gt_pairs.astype(np.int64), gt_traj, gt_info, err_thresh)
        n_valids.append(n_valid)
        precisions.append(prec)
        recalls.append(rec)

        # RE/TE over successful pairs, against the matched gt poses
        ok = flags == 0
        gt_lookup = {(int(p[0]), int(p[1])): i
                     for i, p in enumerate(gt_pairs.astype(np.int64))}
        matched = np.array([gt_lookup.get((int(p[0]), int(p[1])), -1)
                            for p in est_pairs.astype(np.int64)])
        valid_match = matched >= 0
        sel = ok & valid_match
        if sel.sum() > 0:
            re = rotation_error_deg(est_traj[sel][:, :3, :3],
                                    gt_traj[matched[sel]][:, :3, :3])
            te = np.linalg.norm(est_traj[sel][:, :3, 3]
                                - gt_traj[matched[sel]][:, :3, 3], axis=-1)
        else:
            re = te = np.array([np.nan])
        re_medians.append(np.median(re))
        te_medians.append(np.median(te))

        short = SCENE_SHORT_NAMES[orig_idx[scene]] \
            if orig_idx[scene] < len(SCENE_SHORT_NAMES) else scene
        lines.append(f"{short}\t| {prec:.3f}\t| {rec:.3f}\t| "
                     f"{np.median(re):.3f}\t| {np.median(te):.3f}\t| {n_valid:3d}")

        np.save(os.path.join(est_folder, scene, "flag.npy"), flags)
        np.save(os.path.join(est_folder, scene, "errors.npy"), errors)

        if with_details:
            ep = est_pairs.astype(np.int64)
            for k in range(ep.shape[0]):
                if flags[k] == 2:
                    continue  # not in the valid non-consecutive set
                details.append({"scene": scene,
                                "tgt_idx": int(ep[k, 0]),
                                "src_idx": int(ep[k, 1]),
                                "success": bool(flags[k] == 0),
                                "error": float(errors[k])})

    n_valids = np.asarray(n_valids, np.float64)
    w_prec = float((n_valids * precisions).sum() / n_valids.sum())
    w_rec = float((n_valids * recalls).sum() / n_valids.sum())
    lines.append(f"Mean precision: {np.mean(precisions):.3f} +- {np.std(precisions):.3f}")
    lines.append(f"Weighted precision: {w_prec:.3f}")
    lines.append(f"Mean median RRE: {np.mean(re_medians):.3f} +- {np.std(re_medians):.3f}")
    lines.append(f"Mean median RTE: {np.mean(te_medians):.3f} +- {np.std(te_medians):.3f}")
    lines.append(f"Mean recall: {np.mean(recalls):.3f} +- {np.std(recalls):.3f}")
    lines.append(f"Weighted recall (global recall): {w_rec:.3f}")
    if skipped:
        lines.append(f"PARTIAL: {len(skipped)} scene(s) not evaluated: "
                     + ", ".join(skipped))
    if with_details:
        return "\n".join(lines), float(np.mean(recalls)), details
    return "\n".join(lines), float(np.mean(recalls))
