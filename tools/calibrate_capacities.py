#!/usr/bin/env python3
"""Calibrate static bucket capacities and neighbor caps for a dataset.

TPU-native analogue of the reference's `calibrate_neighbors`
(finegrained_kpconv.py:707-739): where the reference histograms
*neighbor counts* to pick `neighborhood_limits` (80th percentile), the
fixed-shape design additionally needs per-level *point capacities*.
This tool samples the dataset, builds exact pyramids in numpy, and
reports:

- per-level point-count percentiles -> suggested `pyramid_capacities`
- per-level neighbor-count percentiles -> suggested
  `neighborhood_limits` (keep_ratio mass kept, default 0.8)

Usage: python tools/calibrate_capacities.py --config conf/3dmatch.yaml
           [--samples 200] [--keep_ratio 0.8]
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def numpy_grid_subsample(points, cell):
    origin = np.floor(points.min(0) / cell) * cell
    ijk = np.floor((points - origin) / cell).astype(np.int64)
    _, inv = np.unique(ijk, axis=0, return_inverse=True)
    n = inv.max() + 1
    sums = np.zeros((n, 3))
    np.add.at(sums, inv, points)
    counts = np.bincount(inv, minlength=n)
    return sums / counts[:, None]


def neighbor_counts(queries, supports, radius):
    from scipy.spatial import cKDTree
    tree = cKDTree(supports)
    return np.asarray([len(x) for x in
                       tree.query_ball_point(queries, radius)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--keep_ratio", type=float, default=0.8)
    ap.add_argument("--capacity_percentile", type=float, default=99.0)
    args = ap.parse_args()

    from fgfusion_tpu.utils.config import load_config
    from fgfusion_tpu.data.loader import make_dataset

    cfg = load_config(args.config)
    dataset = make_dataset(cfg, "train")
    n_samples = min(args.samples, len(dataset))

    num_levels = cfg["num_layers"]
    level_counts = [[] for _ in range(num_levels)]
    nb_counts = [[] for _ in range(num_levels)]

    r0 = cfg["first_subsampling_dl"] * cfg["conv_radius"]
    rng = np.random.default_rng(0)
    for i in rng.permutation(len(dataset))[:n_samples]:
        sample = dataset.__getitem__(int(i))
        for cloud in (sample["src_xyz"], sample["tgt_xyz"]):
            pts = np.asarray(cloud, np.float64)
            r = r0
            for lvl in range(num_levels):
                level_counts[lvl].append(len(pts))
                nb_counts[lvl].append(
                    np.percentile(neighbor_counts(pts, pts, r), 95))
                if lvl + 1 < num_levels:
                    pts = numpy_grid_subsample(pts, 2 * r / cfg["conv_radius"])
                    r *= 2

    print("suggested config:")
    caps = []
    for lvl in range(num_levels):
        c = int(np.percentile(level_counts[lvl], args.capacity_percentile))
        c = (c + 63) // 64 * 64
        caps.append(c)
        nb = int(np.percentile(nb_counts[lvl], args.keep_ratio * 100))
        print(f"  level {lvl}: points p{args.capacity_percentile:.0f}={c} "
              f"neighbors p{args.keep_ratio*100:.0f}={nb}")
    print(f"  pyramid_capacities: {caps}")


if __name__ == "__main__":
    main()
