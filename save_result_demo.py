#!/usr/bin/env python3
"""Inference demo: run the model over the pairs of one scene's gt.log
and write the predicted poses to pose.log (for evo RMSE evaluation via
tools/convert_evo.py).

Reference: save_result_demo.py:117-196 — iterates every `stride`-th
gt.log pair of a scene, runs a direct pair forward (no Dataset/Trainer),
and appends the final-layer 4x4 pose.

Usage:
  python save_result_demo.py --resume CKPT_DIR --config conf/3dmatch.yaml \
      --scene_dir /path/to/fragments --gt_log /path/to/gt.log \
      [--stride 5] [--out pose.log] [--crop_radius R]
"""
import argparse
import os
import sys

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--resume", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--scene_dir", required=True,
                   help="dir containing cloud_bin_*.pth fragments")
    p.add_argument("--gt_log", required=True)
    p.add_argument("--stride", type=int, default=5)
    p.add_argument("--out", default="pose.log")
    p.add_argument("--crop_radius", type=float, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from fgfusion_tpu.benchmark.benchmark_3dmatch_rr import read_trajectory
    from fgfusion_tpu.data.buckets import collate_pairs
    from fgfusion_tpu.data.threedmatch import _load_cloud
    from fgfusion_tpu.models import get_model
    from fgfusion_tpu.ops import PyramidSpec
    from fgfusion_tpu.train.checkpoint import CheckpointManager
    from fgfusion_tpu.train.trainer import create_train_state, make_eval_step
    from fgfusion_tpu.utils.config import load_config

    cfg = load_config(args.config)
    caps = cfg.get("pyramid_capacities", [16384, 6144, 2048, 768])
    spec = PyramidSpec.from_config(cfg, caps)
    model = get_model(cfg["model"])(cfg=dict(cfg))

    pairs, _ = read_trajectory(args.gt_log)
    pairs = pairs[::args.stride]

    state = None
    eval_step = make_eval_step(model, spec)
    with open(args.out, "w") as out:
        for k, (i, j, n) in enumerate(pairs.astype(np.int64)):
            src = _load_cloud(os.path.join(args.scene_dir, f"cloud_bin_{j}.pth"))
            tgt = _load_cloud(os.path.join(args.scene_dir, f"cloud_bin_{i}.pth"))
            if args.crop_radius:
                src = src[np.linalg.norm(src - src.mean(0), axis=1)
                          < args.crop_radius]
                tgt = tgt[np.linalg.norm(tgt - tgt.mean(0), axis=1)
                          < args.crop_radius]
            sample = {"src_xyz": src, "tgt_xyz": tgt,
                      "pose": np.eye(4, dtype=np.float32)[:3]}
            batch = collate_pairs([sample], spec.capacities[0])
            if state is None:
                state, _tx = create_train_state(model, cfg, spec, batch, abstract=True)
                state, _ = CheckpointManager(args.resume).load(state, best=True)
            pred, _, _ = eval_step(state, batch)
            pose = np.asarray(pred["pose"])[-1, 0]
            pose44 = np.concatenate([pose, [[0, 0, 0, 1]]], axis=0)
            out.write(f"{i} {j} {n}\n")
            for row in pose44:
                out.write(" ".join(f"{v:.12f}" for v in row) + "\n")
            print(f"{k + 1}/{len(pairs)}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
