#!/usr/bin/env python3
"""Precompute overlap masks/correspondences for 3DMatch pairs into an
HDF5 cache (speeds up data loading).

Reference: data_processing/compute_overlap_3dmatch.py:28-50 — same
output layout: pair_{idx:06d}/{src_mask, tgt_mask, src_tgt_corr} in
`{phase}[_{benchmark}]_pairs-overlapmask.h5` at the dataset root.

Usage: python tools/compute_overlap_3dmatch.py --config conf/3dmatch.yaml
           --phase train [--benchmark 3DMatch]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--phase", default="train",
                    choices=["train", "val", "test"])
    ap.add_argument("--benchmark", default=None)
    args = ap.parse_args()

    import h5py
    from fgfusion_tpu.utils.config import load_config
    from fgfusion_tpu.data.threedmatch import ThreeDMatchDataset
    from fgfusion_tpu.geometry import se3_np
    from fgfusion_tpu.utils.pointcloud import compute_overlap

    cfg = load_config(args.config)
    if args.benchmark:
        cfg["benchmark"] = args.benchmark
    dataset = ThreeDMatchDataset(cfg, args.phase)
    dataset.pairs_data = None  # force recompute

    suffix = f"_{args.benchmark}" if args.phase == "test" else ""
    out_path = os.path.join(dataset.base_dir,
                            f"{args.phase}{suffix}_pairs-overlapmask.h5")
    with h5py.File(out_path, "w") as f:
        for i in range(len(dataset)):
            s = dataset.__getitem__(i)
            src_ov, tgt_ov, corr = compute_overlap(
                se3_np.se3_transform(s["pose"], s["src_xyz"]),
                s["tgt_xyz"], cfg["overlap_radius"])
            g = f.create_group(f"pair_{i:06d}")
            g.create_dataset("src_mask", data=src_ov, compression="lzf")
            g.create_dataset("tgt_mask", data=tgt_ov, compression="lzf")
            g.create_dataset("src_tgt_corr", data=corr, compression="lzf")
            if (i + 1) % 100 == 0:
                print(f"{i + 1}/{len(dataset)}")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
