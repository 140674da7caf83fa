#!/usr/bin/env python3
"""MCD trajectory evaluation: pairwise registration -> chained odometry
-> pose.log -> TUM (tools/convert_evo.py) -> APE RMSE.

Reference flow (evo/Readme.txt:1-6): save_result_demo.py writes the
predicted pose log, evo/convert_evo.py converts to the TUM format, and
`evo_ape` computes the RMSE. The evo package isn't installable here
(no egress), so the final step — APE translation RMSE, optionally after
SE(3) Umeyama alignment exactly as `evo_ape -a` — is computed inline.

The trajectory is chained over CONSECUTIVE test-frame pairs: with
x_j = T_rel x_i (model output, src body i -> tgt body j) and world
poses x_w = T_k x_k, consistency gives T_j = T_i @ T_rel^{-1}.

Usage:
  python tools/mcd/eval_mcd_rmse.py --resume CKPT_DIR \
      --config conf/mcd_synth.yaml [--out_dir logs/mcd_rmse]
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def to44(pose34):
    T = np.eye(4)
    T[:3] = pose34
    return T


def write_pose_log(path, poses44):
    with open(path, "w") as f:
        for k, T in enumerate(poses44):
            f.write(f"{k}\t{k}\t{len(poses44)}\n")
            for row in T:
                f.write("\t".join(f"{v:.12f}" for v in row) + "\n")


def read_tum(path):
    data = np.loadtxt(path)
    return data[:, 1:4]  # positions


def umeyama_se3(est, gt):
    """SE(3) alignment (no scale) of est onto gt — evo_ape -a."""
    mu_e, mu_g = est.mean(0), gt.mean(0)
    H = (est - mu_e).T @ (gt - mu_g)
    U, _, Vt = np.linalg.svd(H)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ S @ U.T
    t = mu_g - R @ mu_e
    return est @ R.T + t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resume", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--out_dir", default="logs/mcd_rmse")
    args = ap.parse_args()

    platform = os.environ.get("FGFUSION_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)

    from fgfusion_tpu.inference import InferenceEngine
    from fgfusion_tpu.utils.config import load_config
    from fgfusion_tpu.utils.misc import enable_persistent_compile_cache
    from fgfusion_tpu.data.threedmatch import _load_cloud
    from tools.convert_evo import convert

    enable_persistent_compile_cache()
    cfg = load_config(args.config)
    root = cfg["root"]
    pkl = os.path.join(root, cfg.get(
        "mcd_pkl_pattern", "tuhh_night_09_mergeMiniGap_{phase}.pkl"
    ).format(phase="test"))
    with open(pkl, "rb") as f:
        infos = pickle.load(f)

    # consecutive-frame pairs only (gap == 1), ordered by src frame id
    def frame_id(p):
        return int(os.path.basename(p).split("_")[-1].split(".")[0])

    seq = []
    for k in range(len(infos["src"])):
        i, j = frame_id(infos["src"][k]), frame_id(infos["tgt"][k])
        if j == i + 1:
            seq.append((i, k))
    seq.sort()
    if not seq:
        sys.exit("no consecutive-frame pairs in the test pkl")

    engine = InferenceEngine.from_checkpoint(args.resume, args.config)

    # GT world poses from the sidecars
    def world_pose(frame_path):
        txt = os.path.join(root, frame_path.replace(".pth", ".txt"))
        rows = [[float(v) for v in line.split()]
                for line in open(txt).readlines()[:3]]
        return to44(np.asarray(rows))

    first_src = infos["src"][seq[0][1]]
    T_est = [world_pose(first_src)]      # anchor at the GT start pose
    T_gt = [world_pose(first_src)]
    rel_rot_err, rel_trans_err = [], []
    for i, k in seq:
        src = _load_cloud(os.path.join(root, infos["src"][k]))
        tgt = _load_cloud(os.path.join(root, infos["tgt"][k]))
        pose34, _ = engine.register(src, tgt)
        T_rel = to44(pose34)
        T_gt_rel = to44(np.concatenate(
            [np.asarray(infos["rot"][k]),
             np.asarray(infos["trans"][k]).reshape(3, 1)], axis=1))
        # per-pair errors
        dR = T_rel[:3, :3].T @ T_gt_rel[:3, :3]
        rel_rot_err.append(np.degrees(np.arccos(
            np.clip((np.trace(dR) - 1) / 2, -1, 1))))
        rel_trans_err.append(np.linalg.norm(T_rel[:3, 3] - T_gt_rel[:3, 3]))
        T_est.append(T_est[-1] @ np.linalg.inv(T_rel))
        T_gt.append(T_gt[-1] @ np.linalg.inv(T_gt_rel))

    os.makedirs(args.out_dir, exist_ok=True)
    est_log = os.path.join(args.out_dir, "pose.log")
    gt_log = os.path.join(args.out_dir, "gt_pose.log")
    write_pose_log(est_log, T_est)
    write_pose_log(gt_log, T_gt)
    est_tum = est_log.replace(".log", "_tum.txt")
    gt_tum = gt_log.replace(".log", "_tum.txt")
    convert(est_log, est_tum)
    convert(gt_log, gt_tum)

    p_est, p_gt = read_tum(est_tum), read_tum(gt_tum)
    ape = np.linalg.norm(p_est - p_gt, axis=1)
    ape_aligned = np.linalg.norm(umeyama_se3(p_est, p_gt) - p_gt, axis=1)
    print(f"pairs: {len(seq)} | traj frames: {len(T_est)}")
    print(f"per-pair rot err:   mean {np.mean(rel_rot_err):.3f} deg, "
          f"median {np.median(rel_rot_err):.3f} deg")
    print(f"per-pair trans err: mean {np.mean(rel_trans_err):.4f}, "
          f"median {np.median(rel_trans_err):.4f}")
    print(f"APE RMSE (raw):     {np.sqrt(np.mean(ape ** 2)):.4f}")
    print(f"APE RMSE (SE3-aligned, evo_ape -a): "
          f"{np.sqrt(np.mean(ape_aligned ** 2)):.4f}")


if __name__ == "__main__":
    main()
