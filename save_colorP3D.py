#!/usr/bin/env python3
"""Feature-PCA visualization: run inference on a pair and write PLYs
colored by a *joint-basis* PCA of the source+target conditioned
features.

Reference: save_colorP3D.py (get_pca_color_pair :54 computes one PCA
basis over the concatenated src+tgt features via torch.pca_lowrank so
the two clouds share a color space). Here the PCA is a numpy SVD.

Usage:
  python save_colorP3D.py --resume CKPT_DIR --config conf/3dmatch.yaml \
      --src cloud_bin_0.pth --tgt cloud_bin_5.pth --out_dir viz/
"""
import argparse
import os

import numpy as np


def pca_color_pair(src_feat: np.ndarray, tgt_feat: np.ndarray):
    """Joint 3-component PCA -> [0,1] RGB for both clouds."""
    both = np.concatenate([src_feat, tgt_feat], axis=0)
    both = both - both.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(both, full_matrices=False)
    proj = both @ vt[:3].T
    lo, hi = proj.min(axis=0), proj.max(axis=0)
    rgb = (proj - lo) / np.maximum(hi - lo, 1e-8)
    return rgb[: src_feat.shape[0]], rgb[src_feat.shape[0]:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resume", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--src", required=True)
    ap.add_argument("--tgt", required=True)
    ap.add_argument("--out_dir", default="viz")
    ap.add_argument("--apply_pose", action="store_true",
                    help="also write the source warped by the predicted pose")
    args = ap.parse_args()

    from fgfusion_tpu.data.buckets import collate_pairs
    from fgfusion_tpu.data.threedmatch import _load_cloud
    from fgfusion_tpu.geometry import se3_np
    from fgfusion_tpu.models import get_model
    from fgfusion_tpu.ops import PyramidSpec
    from fgfusion_tpu.train.checkpoint import CheckpointManager
    from fgfusion_tpu.train.trainer import create_train_state, make_eval_step
    from fgfusion_tpu.utils.config import load_config
    from fgfusion_tpu.utils.ply import write_ply

    cfg = load_config(args.config)
    caps = cfg.get("pyramid_capacities", [16384, 6144, 2048, 768])
    spec = PyramidSpec.from_config(cfg, caps)
    model = get_model(cfg["model"])(cfg=dict(cfg))

    src = _load_cloud(args.src)
    tgt = _load_cloud(args.tgt)
    sample = {"src_xyz": src, "tgt_xyz": tgt,
              "pose": np.eye(4, dtype=np.float32)[:3]}
    batch = collate_pairs([sample], spec.capacities[0])

    state, _tx = create_train_state(model, cfg, spec, batch, abstract=True)
    state, _ = CheckpointManager(args.resume).load(state, best=True)
    pred, _, _ = make_eval_step(model, spec)(state, batch)

    sm = np.asarray(pred["src_mask_c"])[0]
    tm = np.asarray(pred["tgt_mask_c"])[0]
    src_feat = np.asarray(pred["src_feat"])[-1, 0][sm]
    tgt_feat = np.asarray(pred["tgt_feat"])[-1, 0][tm]
    src_kp = np.asarray(pred["src_kp"])[0][sm]
    tgt_kp = np.asarray(pred["tgt_kp"])[0][tm]

    src_rgb, tgt_rgb = pca_color_pair(src_feat, tgt_feat)
    os.makedirs(args.out_dir, exist_ok=True)
    write_ply(os.path.join(args.out_dir, "src_feat.ply"), src_kp, src_rgb)
    write_ply(os.path.join(args.out_dir, "tgt_feat.ply"), tgt_kp, tgt_rgb)
    if args.apply_pose:
        pose = np.asarray(pred["pose"])[-1, 0]
        write_ply(os.path.join(args.out_dir, "src_warped.ply"),
                  se3_np.se3_transform(pose, src_kp), src_rgb)
    print(f"wrote PLYs to {args.out_dir}")


if __name__ == "__main__":
    main()
