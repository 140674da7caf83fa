#!/usr/bin/env python3
"""RANSAC-refined vs direct inference on a trained model.

Exercises the dormant ransac_rigid refinement path (models/ransac.py —
the TPU-native analogue of the reference's vendored ransaclib,
models/ransaclib/ransac.py:303) end to end on real test pairs and
reports rot/trans errors with and without refinement.

Usage:
  FGFUSION_PLATFORM=cpu python tools/compare_ransac.py \
      --resume logs/finegrained_reg_modelnet_synth/<ts>/ckpt \
      --config conf/modelnet_synth.yaml [--n 48]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pose_err(pose_est, pose_gt):
    dR = pose_est[:3, :3].T @ pose_gt[:3, :3]
    rot = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    trans = np.linalg.norm(pose_est[:3, 3] - pose_gt[:3, 3])
    return rot, trans


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resume", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--n", type=int, default=48)
    args = ap.parse_args()

    platform = os.environ.get("FGFUSION_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)

    from fgfusion_tpu.data import get_dataloader
    from fgfusion_tpu.inference import InferenceEngine
    from fgfusion_tpu.utils.config import load_config
    from fgfusion_tpu.utils.misc import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    cfg = load_config(args.config)
    loader = get_dataloader(cfg, "test", num_workers=0)
    dataset = loader.dataset

    engine = InferenceEngine.from_checkpoint(args.resume, args.config)

    rows = {"direct": [], "ransac": []}
    rng = np.random.default_rng(0)
    idxs = rng.choice(len(dataset), size=min(args.n, len(dataset)),
                      replace=False)
    for i, idx in enumerate(idxs):
        s = dataset.__getitem__(int(idx), rng=np.random.default_rng(int(idx)))
        gt = np.asarray(s["pose"])
        pose_d, info = engine.register(s["src_xyz"], s["tgt_xyz"])
        pose_r, info_r = engine.register(s["src_xyz"], s["tgt_xyz"],
                                         refine="ransac")
        rows["direct"].append(pose_err(pose_d, gt))
        rows["ransac"].append(pose_err(pose_r, gt))
        if (i + 1) % 10 == 0:
            print(f"{i + 1}/{len(idxs)} pairs", flush=True)

    for name, vals in rows.items():
        rot = np.array([v[0] for v in vals])
        trans = np.array([v[1] for v in vals])
        succ = float(np.mean((rot < 10.0) & (trans < 0.1)))
        print(f"{name:7s}: rot mean {rot.mean():6.2f} med {np.median(rot):6.2f} "
              f"| trans mean {trans.mean():.4f} med {np.median(trans):.4f} "
              f"| reg_success {succ:.3f}")


if __name__ == "__main__":
    main()
