#!/usr/bin/env python3
"""Sustained multi-device training demo on the virtual CPU mesh.

VERDICT round-2 item 3 asked for a *full short training* — hundreds of
steps — on the 8-device mesh in DP and DP x TP, with the loss
trajectory checked against single-device. The pytest versions
(tests/test_train.py::test_multistep_*) cover 10-20 steps in CI time;
this tool runs the same equivalence at 300 steps and prints the
trajectory summary for the log of record.

Run (CPU, no TPU contention):
    python tools/multidevice_training_demo.py --steps 300
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fgfusion_tpu.models import get_model
    from fgfusion_tpu.parallel import make_mesh, make_mesh_2d, shard_batch, \
        shard_tree
    from fgfusion_tpu.train.trainer import create_train_state, make_train_step
    from test_model import TINY_CFG, SPEC, make_batch

    assert jax.device_count() == 8, jax.devices()
    cfg = dict(TINY_CFG)
    cfg.update(optimizer="AdamW", base_lr=1e-3, weight_decay=1e-4,
               grad_clip=0.1, scheduler="step", scheduler_param=[100000, 0.5])
    model = get_model("finegrained_regtr.RegTR")(cfg=cfg)
    rng = np.random.default_rng(1)
    batch0 = make_batch(rng)
    state0, tx = create_train_state(model, cfg, SPEC, batch0)
    host_state = jax.device_get(state0)
    step_fn = make_train_step(model, tx, SPEC)

    data_rng = np.random.default_rng(7)
    batches = [make_batch(data_rng, b=8) for _ in range(args.steps)]

    def run(mesh, state):
        traj = []
        t0 = time.perf_counter()
        for b in batches:
            state, losses = step_fn(state, shard_batch(b, mesh))
            traj.append(float(losses["total"]))
        return np.asarray(traj), time.perf_counter() - t0, state

    fresh = lambda: jax.tree.map(jnp.asarray, host_state)

    traj1, dt1, state_1 = run(make_mesh(jax.devices()[:1]), fresh())
    print(f"single-device : {args.steps} steps in {dt1:.1f}s  "
          f"loss {traj1[0]:.4f} -> {traj1[-1]:.4f}", flush=True)

    traj8, dt8, state_8 = run(make_mesh(), fresh())
    print(f"DP-8          : {args.steps} steps in {dt8:.1f}s  "
          f"loss {traj8[0]:.4f} -> {traj8[-1]:.4f}", flush=True)

    mesh42 = make_mesh_2d(4, 2)
    traj42, dt42, state_42 = run(mesh42, shard_tree(fresh(), mesh42))
    print(f"DP4 x TP2     : {args.steps} steps in {dt42:.1f}s  "
          f"loss {traj42[0]:.4f} -> {traj42[-1]:.4f}", flush=True)

    # Pointwise equality over hundreds of steps is not the right
    # statement — AdamW's sqrt(v) makes near-zero weights chaotically
    # sensitive to the gradient-psum reduction order, so a ~1e-7
    # reduction-order difference grows exponentially (measured: ~1e-3
    # by step 40, percent-level by step ~90 on this config; see
    # tests/test_train.py for the same analysis). The meaningful
    # statements, gated here:
    #   (a) pointwise match over the first 10 steps (rtol 5e-3, the
    #       pytest gate) — the sharded step IS the same computation.
    #       TP re-tiles every matmul (different in-matmul reduction
    #       order), so its chaos onset is earlier than DP's (measured:
    #       dev>1% at step 25 vs 37);
    #   (b) converged loss level agrees within 2% — the same
    #       optimization process, not merely the same early steps;
    #   (c) chaos onset reported, not asserted.
    n_head = min(10, args.steps)
    for name, traj in (("DP-8", traj8), ("DP4xTP2", traj42)):
        head = float(np.max(np.abs(traj[:n_head] - traj1[:n_head]) /
                            np.abs(traj1[:n_head])))
        rel = np.abs(traj - traj1) / np.abs(traj1)
        onset = int(np.argmax(rel > 1e-2)) if bool(np.any(rel > 1e-2)) \
            else args.steps
        tail = abs(float(np.mean(traj[-50:]) - np.mean(traj1[-50:]))) / \
            abs(float(np.mean(traj1[-50:])))
        print(f"{name}: max rel dev over first {n_head} steps {head:.2e}; "
              f"fp-chaos onset (first step with dev>1%) {onset}; "
              f"final-50-step mean loss rel dev {tail:.2e}", flush=True)
        assert head < 5e-3, f"{name} early trajectory diverged"
        assert tail < 2e-2, f"{name} converged loss level diverged"

    # Functional sanity of the trained models on held-out data. Post
    # fp-chaos the endpoints are legitimately DIFFERENT weight vectors
    # (measured: single-batch eval deviates up to ~5% after 300 steps),
    # so this is a coarse same-quality gate (10% on a 64-pair mean);
    # the equivalence claims are the two trajectory gates above.
    from fgfusion_tpu.train.trainer import make_eval_step
    eval_step = make_eval_step(model, SPEC)
    eval_rng = np.random.default_rng(99)
    held_out = [make_batch(eval_rng, b=8) for _ in range(8)]
    evals = {}
    for name, st in (("single", state_1), ("DP-8", state_8),
                     ("DP4xTP2", state_42)):
        s = jax.device_put(jax.device_get(st))   # strip mesh shardings
        evals[name] = float(np.mean(
            [float(eval_step(s, b)[1]["total"]) for b in held_out]))
    print("held-out eval loss (64 pairs): " +
          "  ".join(f"{k}={v:.4f}" for k, v in evals.items()), flush=True)
    for name in ("DP-8", "DP4xTP2"):
        dev = abs(evals[name] - evals["single"]) / abs(evals["single"])
        assert dev < 1e-1, f"{name} held-out model diverged ({dev:.2e})"
    print("EQUIVALENT", flush=True)


if __name__ == "__main__":
    main()
