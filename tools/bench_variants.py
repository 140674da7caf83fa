#!/usr/bin/env python3
"""Measure bench.py's forward under PyramidSpec variants on the TPU.

Round-2 perf levers (STATUS.md): spatial sort + paged one-hot gather,
kNN chunk sizing. Each variant is a fresh XLA program (minutes through
the compile relay, persistently cached), so run this detached and give
it time on the first pass:

    (setsid nohup python tools/bench_variants.py > variants.log 2>&1 &)

Prints one line per variant: name, total forward ms, pairs/s.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


VARIANTS = {
    # NOTE on the absent paged-gather variants: the paged one-hot MXU
    # gather (ops/paged_gather.py) is analytically ruled out at L0 for
    # this workload — MXU lane quantization prices the selection matmul
    # at rows x window x max(D,128) x passes regardless of how thin the
    # gathered row is, and the measured page windows (4-6k of 12k rows,
    # tools/band_experiment2.py) put that at tens of ms vs XLA's
    # ~5.8 ms latency-bound gather. See DESIGN.md §10.
    "baseline": {},
    "knn_chunk_4096": dict(knn_chunk=4096),
    "knn_chunk_12288": dict(knn_chunk=12288),
    "fused_knn": dict(fused_knn=True),
    # round-3: force the fused coords+feats+sum gather to stay ONE
    # gather (XLA otherwise splits the concat into per-operand narrow
    # gathers, each paying the 128-lane row cost)
    "gather_barrier": dict(_cfg=dict(gather_barrier=True)),
    # round-3: serving throughput at batch>1 — the batch-1 forward is
    # memory-LATENCY-bound (1.7 flops/byte, gather rows), so batching
    # pairs should amortize row latency and raise pairs/s superlinearly
    # vs the naive 1/dt expectation
    "batch2": dict(_batch=2),
    "batch4": dict(_batch=4),
    # round-3: banded kNN — Morton-sorted levels, per-tile support
    # windows (W = frac * Ns). Cuts the (Nq, Ns) distance matrix, its
    # d2 HBM round trip, and the top-k width ~3x, and replaces the
    # lax.map chunk loop with one batched einsum. Window recall
    # measured in tools/band_recall.py; accuracy must be re-validated
    # on a trained model before shipping as default (DESIGN.md §13).
    "banded_034": dict(knn_band_frac=0.34),
    "banded_025": dict(knn_band_frac=0.25),
    "banded_034_bc1024": dict(knn_band_frac=0.34, knn_band_chunk=1024),
    # L0-only banding: coarse levels searched fully (recall >= 0.94
    # everywhere on the bench workload — DESIGN.md §13 table) at
    # nearly the same saving, since L0 is ~8/9 of the distance work
    "banded_034_L0": dict(knn_band_frac=0.34, knn_band_min_ns=8192),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n0", type=int, default=12288)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names")
    args = ap.parse_args()

    import jax
    from fgfusion_tpu.utils.misc import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    from bench import bench_config, bench_spec
    from fgfusion_tpu.models import get_model
    from __graft_entry__ import _make_batch

    cfg = bench_config()
    model = get_model("finegrained_regtr.RegTR")(cfg=cfg)
    batch = _make_batch(b=1, n0=args.n0)

    names = (args.only.split(",") if args.only else list(VARIANTS))
    variables = None
    for name in names:
        overrides = dict(VARIANTS[name])
        cfg_over = overrides.pop("_cfg", None)
        b = overrides.pop("_batch", 1)
        spec = bench_spec(args.n0, **overrides)
        vmodel = model if not cfg_over else \
            get_model("finegrained_regtr.RegTR")(cfg=dict(cfg, **cfg_over))
        vbatch = batch if b == 1 else _make_batch(b=b, n0=args.n0)
        if variables is None:
            variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                                   spec, train=False)

        fwd = jax.jit(lambda v, bt, s=spec, m=vmodel: m.apply(v, bt, s,
                                                              train=False))
        t0 = time.perf_counter()
        out = fwd(variables, vbatch)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(variables, vbatch)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        over = out.get("n_page_overflow")
        over = int(over.sum()) if over is not None and over.size else 0
        print(f"{name:22s} {dt * 1e3:8.2f} ms  {b / dt:7.2f} pairs/s  "
              f"(compile+warm {t_compile:.0f}s, page_overflow={over})",
              flush=True)


if __name__ == "__main__":
    main()
