#!/usr/bin/env python3
"""Training launcher.

CLI-parity with the reference train.py (reference train.py:22-47):
  python train.py --config conf/3dmatch.yaml [--logdir ..] [--dev]
      [--name tag] [--summary_every N] [--validate_every N] [--debug]
      [--num_workers N] [--resume ckpt_dir] [--nb_sanity_val_steps N]
On --resume without --config, the config is recovered from the
checkpoint's log dir (reference train.py:50-62).
"""
import argparse
import glob
import os
import sys


def parse_args():
    p = argparse.ArgumentParser(description="TPU-native RegTR training")
    p.add_argument("--config", type=str, help="yaml config")
    p.add_argument("--logdir", type=str, default="logs")
    p.add_argument("--dev", action="store_true",
                   help="reuse+wipe ./logdev as the log dir")
    p.add_argument("--name", type=str, help="experiment name suffix")
    p.add_argument("--summary_every", type=int, default=500)
    p.add_argument("--validate_every", type=int, default=-1)
    p.add_argument("--debug", action="store_true",
                   help="enable jax nan-debugging")
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--resume", type=str, help="checkpoint dir to resume")
    p.add_argument("--nb_sanity_val_steps", type=int, default=2)
    p.add_argument("--niter", type=int, default=None,
                   help="override cfg niter (>0 steps, <0 epochs) — "
                        "e.g. extend a resumed run")
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel size (devices form a "
                        "(n/tp, tp) data x model mesh; parallel/tp.py)")
    return p.parse_args()


def main():
    args = parse_args()

    # Stack dumps on demand: the trainer can wedge with every thread in
    # futex_wait (post-checkpoint deadlock, STATUS.md round 3/4c).
    # `kill -USR1 <pid>` dumps all Python thread stacks to stderr so
    # the next hang yields a root cause, not just a watchdog restart.
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1, all_threads=True)
    print("faulthandler: SIGUSR1 registered", flush=True)

    # FGFUSION_PLATFORM=cpu forces host execution (see test.py);
    # FGFUSION_HOST_DEVICES=N adds N virtual host devices (multi-chip
    # rehearsal without hardware).
    platform = os.environ.get("FGFUSION_PLATFORM")
    n_host = os.environ.get("FGFUSION_HOST_DEVICES")
    if n_host:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_host}").strip()
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)

    if args.debug:
        import jax
        jax.config.update("jax_debug_nans", True)

    from fgfusion_tpu.utils.config import load_config, save_config
    from fgfusion_tpu.utils.misc import (enable_persistent_compile_cache,
                                         prepare_logger)
    enable_persistent_compile_cache()

    config_path = args.config
    if config_path is None and args.resume:
        # recover config archived next to the checkpoint
        cands = glob.glob(os.path.join(os.path.dirname(args.resume.rstrip("/")),
                                       "..", "config.yaml")) + \
                glob.glob(os.path.join(args.resume, "..", "config.yaml")) + \
                glob.glob(os.path.join(args.resume, "config.yaml"))
        if not cands:
            sys.exit("--config not given and none found near --resume")
        config_path = cands[0]
    if config_path is None:
        sys.exit("--config is required")

    cfg = load_config(config_path)
    if args.name:
        cfg["expt_name"] = f"{cfg.get('expt_name', 'run')}_{args.name}"
    if args.tp is not None:
        cfg["tp_size"] = args.tp
    if args.niter is not None:
        cfg["niter"] = args.niter

    logger, log_dir = prepare_logger(
        os.path.join(args.logdir, cfg.get("expt_name", "run")), dev=args.dev)
    save_config(config_path, os.path.join(log_dir, "config.yaml"))

    from fgfusion_tpu.data import get_dataloader
    from fgfusion_tpu.models import get_model
    from fgfusion_tpu.ops import PyramidSpec
    from fgfusion_tpu.train.trainer import Trainer

    train_loader = get_dataloader(cfg, "train", num_workers=args.num_workers)
    val_loader = get_dataloader(cfg, "val", num_workers=args.num_workers)

    caps = cfg.get("pyramid_capacities")
    if caps is None:
        from fgfusion_tpu.data.buckets import capacity_schedule
        caps = capacity_schedule(train_loader.n0, cfg["num_layers"])
    spec = PyramidSpec.from_config(cfg, caps)

    model = get_model(cfg["model"])(cfg=dict(cfg))
    trainer = Trainer(cfg, log_dir,
                      niter=cfg.get("niter"),
                      summary_every=args.summary_every,
                      validate_every=args.validate_every,
                      nb_sanity_val_steps=args.nb_sanity_val_steps,
                      logger=logger)
    trainer.fit(model, spec, train_loader, val_loader, resume=args.resume)


if __name__ == "__main__":
    main()
