#!/usr/bin/env python3
"""Train-step time with the feature_un loss gated off (wt 0.0, the
shipped default) vs forced on (the reference's always-compute quirk) —
the measurement VERDICT item 8 asks for, at the 16k 3DMatch config.

Run on the real TPU (detached, no other TPU process):
  (setsid nohup python tools/measure_feature_un_gate.py > fun_gate.log 2>&1 &)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from fgfusion_tpu.utils.misc import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    from __graft_entry__ import _make_batch
    from bench import bench_config
    from fgfusion_tpu.models import get_model
    from fgfusion_tpu.ops import PyramidSpec
    from fgfusion_tpu.train.trainer import create_train_state, make_train_step

    base = bench_config()
    base.update(optimizer="AdamW", base_lr=1e-4, weight_decay=1e-4,
                grad_clip=0.1, scheduler="step", scheduler_param=[205860, 0.5])
    spec = PyramidSpec(
        architecture=tuple(base["architecture"]),
        first_subsampling_dl=base["first_subsampling_dl"],
        conv_radius=base["conv_radius"],
        neighborhood_limits=tuple(base["neighborhood_limits"]),
        capacities=(16384, 6400, 2048, 768),
        approx_knn=True,
    )
    batch = _make_batch(b=2, n0=16384)

    for name, wt in (("gated (wt 0.0)", 0.0), ("ungated (wt 1e-9)", 1e-9)):
        cfg = dict(base, wt_feature_un=wt)
        model = get_model("finegrained_regtr.RegTR")(cfg=cfg)
        state, tx = create_train_state(model, cfg, spec, batch)
        step = make_train_step(model, tx, spec)
        t0 = time.perf_counter()
        state, losses = step(state, batch)
        jax.block_until_ready(losses["total"])
        t_compile = time.perf_counter() - t0
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            state, losses = step(state, batch)
        jax.block_until_ready(losses["total"])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:18s}: {dt * 1e3:7.2f} ms/step "
              f"(compile+warm {t_compile:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
