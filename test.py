#!/usr/bin/env python3
"""Evaluation launcher.

CLI-parity with the reference test.py (reference test.py:16-81):
  python test.py --resume CKPT_DIR --benchmark {3DMatch,3DLoMatch,
      ModelNet,ModelLoNet} [--weight_th W] [--config conf/*.yaml]
ModelLoNet evaluates the ModelNet model with partial=[0.5, 0.5]
(reference test.py:70). --weight_th overrides the pose solver's
confidence gate (reference test.py:34,72-74).
"""
import argparse
import glob
import os
import sys


def parse_args():
    p = argparse.ArgumentParser(description="TPU-native RegTR evaluation")
    p.add_argument("--config", type=str)
    p.add_argument("--resume", type=str, required=True,
                   help="checkpoint dir (ckpt/ inside a training log dir)")
    p.add_argument("--benchmark", type=str, default="3DMatch",
                   choices=["3DMatch", "3DLoMatch", "ModelNet", "ModelLoNet"])
    p.add_argument("--weight_th", type=float, default=None)
    p.add_argument("--exact_knn", action="store_true",
                   help="exact neighbor search (overrides approx_knn)")
    p.add_argument("--fused_knn", action="store_true",
                   help="fused Pallas approx kNN (overrides fused_knn)")
    p.add_argument("--knn_band", type=float, default=None, metavar="FRAC",
                   help="Morton-banded neighbor search: window = FRAC * "
                        "Ns on levels with >= knn_band_min_ns supports "
                        "(DESIGN.md §13). Accuracy-validation flag for "
                        "the banded perf variant")
    p.add_argument("--ransac", action="store_true",
                   help="refit the final pose with on-device RANSAC "
                        "over the predicted correspondences (in-graph)")
    p.add_argument("--ransac_select", action="store_true",
                   help="run RANSAC but keep the learned pose when it "
                        "scores more weighted inliers (per-pair "
                        "selection; best of both regimes)")
    p.add_argument("--eval_buckets", type=str, default=None,
                   help="comma-separated bucket-ladder override (e.g. "
                        "'36864' for a single bucket). Each (bucket, "
                        "batch) shape is its own XLA program — minutes "
                        "of remote compile on a cold cache — so a "
                        "deadline-bounded eval can trade per-pair speed "
                        "for ONE compile by padding everything to the "
                        "largest bucket (protocol-neutral: padding is "
                        "masked)")
    p.add_argument("--eval_batch", type=int, default=None,
                   help="override cfg eval_batch_size (pairs per "
                        "batched eval step at the smallest bucket)")
    p.add_argument("--logdir", type=str, default="logs")
    p.add_argument("--dev", action="store_true")
    p.add_argument("--num_workers", type=int, default=2)
    return p.parse_args()


def main():
    args = parse_args()

    # `kill -USR1 <pid>` dumps all Python thread stacks (same hang
    # diagnostics as train.py — see STATUS.md post-checkpoint deadlock).
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1, all_threads=True)
    print("faulthandler: SIGUSR1 registered", flush=True)

    # FGFUSION_PLATFORM=cpu runs the eval on the host (the env var
    # JAX_PLATFORMS alone is ignored: sitecustomize registers the axon
    # TPU plugin at interpreter boot) — lets evals proceed while a
    # training job owns the TPU tunnel.
    platform = os.environ.get("FGFUSION_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)

    from fgfusion_tpu.utils.config import load_config, save_config
    from fgfusion_tpu.utils.misc import (enable_persistent_compile_cache,
                                         prepare_logger)
    enable_persistent_compile_cache()

    config_path = args.config
    if config_path is None:
        cands = glob.glob(os.path.join(args.resume, "config.yaml")) + \
                glob.glob(os.path.join(args.resume, "..", "config.yaml"))
        if not cands:
            sys.exit("--config not given and none found near --resume")
        config_path = cands[0]
    cfg = load_config(config_path)

    # benchmark/dataset consistency (reference test.py:63-70)
    if args.benchmark in ("3DMatch", "3DLoMatch"):
        assert cfg["dataset"] == "3dmatch", \
            "3DMatch benchmarks require a 3dmatch-trained model"
        cfg["benchmark"] = args.benchmark
    else:
        assert cfg["dataset"] == "modelnet", \
            "ModelNet benchmarks require a modelnet-trained model"
        cfg["benchmark"] = args.benchmark
        if args.benchmark == "ModelLoNet":
            cfg["partial"] = [0.5, 0.5]

    if args.weight_th is not None:
        cfg["test_weight_th"] = args.weight_th
    if args.ransac:
        cfg["test_ransac"] = True
    if args.ransac_select:
        cfg["test_ransac_select"] = True
    if args.exact_knn:
        cfg["approx_knn"] = False
    if args.knn_band is not None:
        cfg["knn_band_frac"] = args.knn_band
    if args.eval_buckets is not None:
        cfg["eval_buckets"] = [int(b) for b in args.eval_buckets.split(",")]
    if args.eval_batch is not None:
        cfg["eval_batch_size"] = args.eval_batch
    if args.fused_knn:
        if args.exact_knn:
            sys.exit("--fused_knn requires the approximate path; it "
                     "cannot be combined with --exact_knn")
        # the fused Pallas kernel is only taken when approx AND fused
        # are both set (ops/neighbors.py) — imply approx so the flag is
        # never silently inert for approx_knn: false configs
        cfg["approx_knn"] = True
        cfg["fused_knn"] = True

    logger, log_dir = prepare_logger(
        os.path.join(args.logdir, cfg.get("expt_name", "run") + "_eval"),
        dev=args.dev)
    save_config(config_path, os.path.join(log_dir, "config.yaml"))

    from fgfusion_tpu.data.loader import make_dataset
    from fgfusion_tpu.models import get_model
    from fgfusion_tpu.ops import PyramidSpec
    from fgfusion_tpu.train.trainer import Trainer

    dataset = make_dataset(cfg, "test")
    caps = cfg.get("pyramid_capacities")
    if caps is None:
        from fgfusion_tpu.data.buckets import capacity_schedule
        caps = capacity_schedule(int(cfg.get("point_capacity", 16384)),
                                 cfg["num_layers"])
    spec = PyramidSpec.from_config(cfg, caps)

    model = get_model(cfg["model"])(cfg=dict(cfg))
    trainer = Trainer(cfg, log_dir, logger=logger)
    results = trainer.test(model, spec, dataset, resume=args.resume,
                           benchmark_name=args.benchmark)
    if "registration_recall" in results:
        logger.info("FINAL registration recall: %.4f",
                    results["registration_recall"])


if __name__ == "__main__":
    main()
