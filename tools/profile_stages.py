#!/usr/bin/env python3
"""Per-stage latency breakdown of the forward pass: preprocess /
encoder / attention / pose, plus total — the TPU analogue of the
reference's `_TIMEIT` CUDA-event instrumentation
(finegrained_regtr.py:112-231), appended to timings.txt in the same
5-column format.

Each stage is measured as the delta between cumulative jitted prefixes
(pyramid; +encoder; +attention; full forward), which is exact up to
XLA's freedom to schedule differently per program. Optionally dumps a
jax.profiler trace for xprof/tensorboard.

Usage: python tools/profile_stages.py [--config conf/3dmatch.yaml]
           [--n0 12288] [--iters 10] [--trace_dir /tmp/jaxtrace]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--n0", type=int, default=12288)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--trace_dir", default=None)
    ap.add_argument("--out", default="timings.txt")
    ap.add_argument("--spatial_sort", action="store_true",
                    help="Morton-sort level 0 inside the pyramid")
    ap.add_argument("--paged", default=None,
                    help="comma-separated per-level page-list capacities "
                         "for the paged one-hot gather, e.g. 24,0,0,0")
    ap.add_argument("--knn_chunk", type=int, default=None)
    ap.add_argument("--exact_knn", action="store_true")
    args = ap.parse_args()

    import jax
    from fgfusion_tpu.models import get_model
    from fgfusion_tpu.ops import PyramidSpec
    from fgfusion_tpu.utils.misc import enable_persistent_compile_cache
    from __graft_entry__ import _make_batch
    enable_persistent_compile_cache()

    from fgfusion_tpu.utils.config import load_config
    cfg = dict(load_config(args.config or "conf/3dmatch.yaml"))
    caps = cfg.get("pyramid_capacities")
    if caps is None or caps[0] != args.n0:
        ratio = args.n0 / caps[0] if caps else 1.0
        caps = [args.n0] + [max(64, int(c * ratio) // 64 * 64)
                            for c in (caps[1:] if caps else [])]
    spec = PyramidSpec.from_config(cfg, caps)
    import dataclasses
    if args.spatial_sort or args.paged:
        spec = dataclasses.replace(spec, spatial_sort=True)
    if args.paged:
        spec = dataclasses.replace(
            spec, paged_p_max=tuple(int(x) for x in args.paged.split(",")))
    if args.knn_chunk:
        spec = dataclasses.replace(spec, knn_chunk=args.knn_chunk)
    if args.exact_knn:
        spec = dataclasses.replace(spec, approx_knn=False)
    print("spec:", spec)

    model = get_model(cfg["model"])(cfg=cfg)
    batch = _make_batch(b=args.batch, n0=args.n0)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, spec,
                           train=False)

    pp = jax.jit(lambda v, b: model.apply(v, b, spec,
                                          method=model.run_preprocess))
    enc = jax.jit(lambda v, b: model.apply(v, b, spec,
                                           method=model.run_encoder))
    att = jax.jit(lambda v, b: model.apply(v, b, spec,
                                           method=model.run_attention))
    full = jax.jit(lambda v, b: model.apply(v, b, spec, train=False))

    t_pp = timeit(pp, variables, batch, iters=args.iters)
    t_enc = timeit(enc, variables, batch, iters=args.iters)
    t_att = timeit(att, variables, batch, iters=args.iters)
    t_all = timeit(full, variables, batch, iters=args.iters)

    stages = {
        "preprocess": t_pp,
        "encoder": max(t_enc - t_pp, 0.0),
        "attention": max(t_att - t_enc, 0.0),
        "pose+decode": max(t_all - t_att, 0.0),
        "total": t_all,
    }
    for k, v in stages.items():
        print(f"{k:>12}: {v * 1e3:8.2f} ms")
    with open(args.out, "a") as f:
        f.write("{:10f}\t{:10f}\t{:10f}\t{:10f}\t{:10f}\n".format(
            stages["preprocess"], stages["encoder"], stages["attention"],
            stages["pose+decode"], stages["total"]))

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                out = full(variables, batch)
            jax.block_until_ready(out)
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
