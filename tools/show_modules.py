#!/usr/bin/env python3
"""Print the parameter tree of a checkpoint (shapes + counts).

Reference: utils/show_modules.py (prints model._modules of a torch
checkpoint). Here the flax param pytree is walked directly.

Usage: python tools/show_modules.py --resume CKPT_DIR
       python tools/show_modules.py --config conf/3dmatch.yaml  (fresh init)
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def walk(tree, prefix=""):
    total = 0
    for k in sorted(tree):
        v = tree[k]
        name = f"{prefix}/{k}" if prefix else k
        if hasattr(v, "shape"):
            n = int(np.prod(v.shape))
            total += n
            print(f"  {name:<70} {str(tuple(v.shape)):<20} {n:>10,}")
        else:
            total += walk(v, name)
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resume", default=None)
    ap.add_argument("--config", default=None)
    args = ap.parse_args()

    if args.resume:
        import orbax.checkpoint as ocp
        mgr = ocp.CheckpointManager(args.resume)
        step = mgr.latest_step()
        state = mgr.restore(step)
        params = state["params"] if isinstance(state, dict) else state.params
        print(f"checkpoint step {step}:")
    else:
        import jax
        from fgfusion_tpu.models import get_model
        from fgfusion_tpu.ops import PyramidSpec
        from fgfusion_tpu.utils.config import load_config
        from fgfusion_tpu.data.buckets import capacity_schedule
        from __graft_entry__ import _make_batch
        cfg = dict(load_config(args.config or "conf/modelnet.yaml"))
        caps = cfg.get("pyramid_capacities") or capacity_schedule(
            768, cfg["num_layers"])
        spec = PyramidSpec.from_config(cfg, caps)
        model = get_model(cfg["model"])(cfg=cfg)
        batch = _make_batch(b=1, n0=caps[0])
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch, spec,
                               train=False)
        params = variables["params"]
        print("fresh init:")

    total = walk(params)
    print(f"total parameters: {total:,}")


if __name__ == "__main__":
    main()
