#!/usr/bin/env python3
"""Re-warm the persistent XLA compile cache for the real-config
programs after any model/ops HLO change.

On this machine TPU compiles go through a remote-compile relay
(minutes per program), so the driver's bench run and round-2 training
must find warm caches. This warms, for conf/3dmatch.yaml:
  1. the full training step (forward+loss+grad+optimizer) at the
     config's bucket (16,384 pts, batch=train_batch_size), and
  2. the eval step (forward+loss+metrics) at batch=1.

Run detached:  (setsid nohup python tools/warm_caches.py > warm.log 2>&1 &)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="conf/3dmatch.yaml")
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_eval", action="store_true")
    args = ap.parse_args()

    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _make_batch
    from fgfusion_tpu.models import get_model
    from fgfusion_tpu.ops import PyramidSpec
    from fgfusion_tpu.train.trainer import (create_train_state,
                                            make_eval_step, make_train_step)
    from fgfusion_tpu.utils.config import load_config

    cfg = load_config(args.config)
    caps = cfg["pyramid_capacities"]
    spec = PyramidSpec.from_config(cfg, caps)
    n0 = caps[0]
    model = get_model(cfg["model"])(cfg=dict(cfg))

    b_train = int(cfg.get("train_batch_size", 2))
    batch = _make_batch(b=b_train, n0=n0)
    print(f"[warm] config={args.config} caps={caps} b={b_train}", flush=True)

    t0 = time.time()
    state, tx = create_train_state(model, cfg, spec, batch)
    print(f"[warm] init (CPU) done in {time.time()-t0:.1f}s", flush=True)

    if not args.skip_train:
        step = make_train_step(model, tx, spec)
        t0 = time.time()
        state, losses = step(state, batch)
        jax.block_until_ready(losses)
        print(f"[warm] train_step compile+run {time.time()-t0:.1f}s "
              f"loss={float(losses['total']):.4f}", flush=True)
        t0 = time.time()
        state, losses = step(state, batch)
        jax.block_until_ready(losses)
        print(f"[warm] train_step steady {time.time()-t0:.3f}s", flush=True)

    if not args.skip_eval:
        ev = make_eval_step(model, spec)
        ebatch = _make_batch(b=int(cfg.get("test_batch_size", 1)), n0=n0)
        t0 = time.time()
        out = ev(state, ebatch)
        jax.block_until_ready(out)
        print(f"[warm] eval_step compile+run {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        out = ev(state, ebatch)
        jax.block_until_ready(out)
        print(f"[warm] eval_step steady {time.time()-t0:.3f}s", flush=True)

    print("[warm] done", flush=True)


if __name__ == "__main__":
    main()
