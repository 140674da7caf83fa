#!/usr/bin/env python3
"""Convert per-frame MCD .pcd point clouds to downsampled .pth files.

Reference: data_processing/MCD/pcd_to_samplepth.py — uniform 1-in-350
downsampling of each frame's cloud, saved float32. Open3D is not
available in this image, so ASCII/binary PCD parsing is implemented
here directly (covers the common x y z [intensity] PCD layouts).

Usage: python tools/mcd/pcd_to_samplepth.py --data_root /path/to/MCD \
           [--stride 350]
"""
import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def read_pcd_xyz(path: str) -> np.ndarray:
    """Minimal PCD reader (ascii + binary, xyz fields)."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            key, _, val = line.partition(" ")
            header[key.upper()] = val
            if key.upper() == "DATA":
                break
        fields = header["FIELDS"].split()
        sizes = list(map(int, header["SIZE"].split()))
        counts = list(map(int, header.get("COUNT", " ".join(
            ["1"] * len(fields))).split()))
        n = int(header["POINTS"])
        xyz_idx = [fields.index(c) for c in ("x", "y", "z")]

        if header["DATA"].startswith("ascii"):
            data = np.loadtxt(f, max_rows=n)
            return data[:, xyz_idx].astype(np.float32)

        # binary: interleaved per-point records — view as a byte matrix
        # and slice each field's column (handles any field layout with
        # float32 x/y/z)
        offsets, off = [], 0
        for s, c in zip(sizes, counts):
            offsets.append(off)
            off += s * c
        point_size = off
        raw = f.read(n * point_size)
        rec = np.frombuffer(raw, dtype=np.uint8,
                            count=n * point_size).reshape(n, point_size)
        out = np.empty((n, 3), np.float32)
        for k, fi in enumerate(xyz_idx):
            if sizes[fi] != 4:
                raise ValueError(f"non-float32 {fields[fi]} field")
            col = np.ascontiguousarray(rec[:, offsets[fi]:offsets[fi] + 4])
            out[:, k] = col.view(np.float32).ravel()
        return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--in_dir", default="cloud_inBody_mergeFrame")
    ap.add_argument("--out_dir", default="cloud_inBody_mergeFrameSample")
    ap.add_argument("--stride", type=int, default=350,
                    help="uniform downsample: keep every Nth point")
    args = ap.parse_args()

    import torch

    in_dir = os.path.join(args.data_root, args.in_dir)
    out_dir = os.path.join(args.data_root, args.out_dir)
    os.makedirs(out_dir, exist_ok=True)

    pcds = sorted(glob.glob(os.path.join(in_dir, "*.pcd")))
    for p in pcds:
        pts = read_pcd_xyz(p)[::args.stride].astype(np.float32)
        out = os.path.join(out_dir,
                           os.path.basename(p).replace(".pcd", ".pth"))
        torch.save(pts, out)
        # carry the pose sidecar along
        pose_src = p.replace(".pcd", ".txt")
        if os.path.exists(pose_src):
            import shutil
            shutil.copy(pose_src, out.replace(".pth", ".txt"))
        print(f"{p} -> {out} ({pts.shape[0]} pts)")


if __name__ == "__main__":
    main()
