#!/usr/bin/env python3
"""Build MCD pair pkls (3DMatch-format info dicts) from per-frame
downsampled .pth clouds + world-pose sidecar .txt files.

Reference: data_processing/MCD/create_MCD_pkl.py +
compute_MCDoverlap.py. For every frame pair (i, j):
  relative pose (src -> tgt frame): R = R_jᵀ R_i, t = R_jᵀ t_i - R_jᵀ t_j
  overlap ratio = fraction of world-frame src points with a tgt point
  within `overlap_radius` (scipy KD-tree / native lib instead of the
  reference's Open3D tree walk).
Splits pairs into train/val at --train_ratio (reference 0.8) and writes
`<prefix>_{train,val,test}.pkl` with keys src/tgt/rot/trans/overlap.

Usage: python tools/mcd/create_mcd_pkl.py --data_root /path/to/MCD \
           [--overlap_radius 0.5] [--min_overlap 0.3]
"""
import argparse
import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, ".")


def load_pose(path: str) -> np.ndarray:
    rows = []
    with open(path) as f:
        for line in f.readlines()[:3]:
            rows.append([float(v) for v in line.split()])
    T = np.eye(4)
    T[:3] = np.asarray(rows)
    return T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--frames_dir", default="cloud_inBody_mergeFrameSample")
    ap.add_argument("--prefix", default="tuhh_night_09_mergeMiniGap")
    ap.add_argument("--overlap_radius", type=float, default=0.5)
    ap.add_argument("--min_overlap", type=float, default=0.3)
    ap.add_argument("--train_ratio", type=float, default=0.8)
    ap.add_argument("--max_gap", type=int, default=0,
                    help="if >0, only pair frames at most this far apart")
    args = ap.parse_args()

    import torch
    from fgfusion_tpu import native

    frame_dir = os.path.join(args.data_root, args.frames_dir)
    pths = sorted(glob.glob(os.path.join(frame_dir, "*.pth")))
    poses = [load_pose(p.replace(".pth", ".txt")) for p in pths]
    clouds = [np.asarray(torch.load(p, weights_only=False), np.float32)
              for p in pths]
    world = [(T[:3, :3] @ c.T).T + T[:3, 3] for T, c in zip(poses, clouds)]

    src, tgt, rot, trans, overlap = [], [], [], [], []
    n = len(pths)
    for i in range(n):
        for j in range(i + 1, n):
            if args.max_gap and j - i > args.max_gap:
                continue
            nearest = native.nearest_within_radius(
                world[i].astype(np.float32), world[j].astype(np.float32),
                args.overlap_radius)
            ratio = float((nearest >= 0).mean())
            if ratio < args.min_overlap:
                continue
            T1, T2 = poses[i], poses[j]
            R = T2[:3, :3].T @ T1[:3, :3]
            t = T2[:3, :3].T @ T1[:3, 3] - T2[:3, :3].T @ T2[:3, 3]
            src.append(os.path.relpath(pths[i], args.data_root))
            tgt.append(os.path.relpath(pths[j], args.data_root))
            rot.append(R)
            trans.append(t.reshape(3, 1))
            overlap.append(ratio)
        print(f"frame {i + 1}/{n}: {len(src)} pairs so far")

    total = len(src)
    cut = int(total * args.train_ratio)
    splits = {"train": slice(0, cut), "val": slice(cut, total),
              "test": slice(cut, total)}
    for phase, sl in splits.items():
        info = {"src": np.array(src[sl]), "tgt": np.array(tgt[sl]),
                "rot": np.array(rot[sl]), "trans": np.array(trans[sl]),
                "overlap": np.array(overlap[sl])}
        out = os.path.join(args.data_root, f"{args.prefix}_{phase}.pkl")
        with open(out, "wb") as f:
            pickle.dump(info, f)
        print(f"wrote {out} ({len(info['src'])} pairs)")


if __name__ == "__main__":
    main()
