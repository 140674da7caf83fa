#!/usr/bin/env python3
"""Export the best params of an orbax checkpoint dir as a portable
params-only npz snapshot (see fgfusion_tpu/train/snapshot.py).

  python tools/export_params.py --resume logs/<run>/ckpt \
      [--config conf/x.yaml] [--out results/snapshots/<name>.npz]

Runs on the CPU backend so it never contends with a TPU process.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resume", required=True, help="orbax ckpt dir")
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--step", type=int, default=None,
                    help="explicit step (default: best)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from fgfusion_tpu.models import get_model
    from fgfusion_tpu.ops import PyramidSpec
    from fgfusion_tpu.train.checkpoint import CheckpointManager
    from fgfusion_tpu.train.snapshot import save_params_npz
    from fgfusion_tpu.train.trainer import create_train_state
    from fgfusion_tpu.utils.config import load_config

    config_path = args.config
    if config_path is None:
        cands = glob.glob(os.path.join(args.resume, "..", "config.yaml")) + \
                glob.glob(os.path.join(args.resume, "config.yaml"))
        if not cands:
            sys.exit("--config not given and none found near --resume")
        config_path = cands[0]
    cfg = load_config(config_path)

    caps = cfg["pyramid_capacities"]
    spec = PyramidSpec.from_config(cfg, caps)
    model = get_model(cfg["model"])(cfg=dict(cfg))
    n0 = caps[0]
    dummy = {
        "src_xyz": np.zeros((1, n0, 3), np.float32),
        "tgt_xyz": np.zeros((1, n0, 3), np.float32),
        "src_mask": np.zeros((1, n0), bool),
        "tgt_mask": np.zeros((1, n0), bool),
        "src_overlap": np.zeros((1, n0), np.float32),
        "tgt_overlap": np.zeros((1, n0), np.float32),
        "pose": np.eye(4, dtype=np.float32)[None, :3],
    }
    state, _ = create_train_state(model, cfg, spec, dummy, abstract=True)
    mgr = CheckpointManager(args.resume)
    state, step = mgr.load(state, step=args.step, best=args.step is None)

    out = args.out
    if out is None:
        os.makedirs("results/snapshots", exist_ok=True)
        out = f"results/snapshots/{cfg.get('expt_name', 'model')}_best.npz"
    save_params_npz(out, state,
                    meta={"score": float(mgr.best_score)}
                    if mgr.best_step == step else None)
    sz = os.path.getsize(out) / 1e6
    print(f"wrote {out} (step {step}, {sz:.1f} MB)")


if __name__ == "__main__":
    main()
