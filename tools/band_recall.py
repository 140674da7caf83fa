#!/usr/bin/env python3
"""Window recall of the banded kNN on the real bench workload (CPU).

The banded search (ops/neighbors.py:_banded_knn) only scores supports
inside a W-wide window of the Morton order per tile of consecutive
queries — a true neighbor outside the window is lost. This measures
that loss in isolation (exact top-k inside the window vs exact
full-width top-k on the SAME sorted arrays) for every pyramid level of
the bench batch, across (knn_band_frac, knn_band_chunk) settings.

Run detached (CPU, ~15 min on the single core):
    (setsid nohup python tools/band_recall.py > band_recall.log 2>&1 &)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def table_recall(full: np.ndarray, band: np.ndarray, ns: int) -> tuple:
    """full/band: (Nq, K) sentinel=ns. Returns (recall, n_true)."""
    hits = tot = 0
    for qi in range(full.shape[0]):
        fs = set(full[qi][full[qi] < ns].tolist())
        if not fs:
            continue
        bs = set(band[qi][band[qi] < ns].tolist())
        tot += len(fs)
        hits += len(fs & bs)
    return hits / max(tot, 1), tot


def main():
    from bench import bench_spec
    from __graft_entry__ import _make_batch
    from fgfusion_tpu.ops.pyramid import build_pyramid
    from fgfusion_tpu.ops.neighbors import radius_knn
    import dataclasses

    n0 = int(os.environ.get("BAND_N0", 12288))
    batch = _make_batch(b=1, n0=n0)
    pts = jnp.concatenate([batch["src_xyz"], batch["tgt_xyz"]], 0)
    msk = jnp.concatenate([batch["src_mask"], batch["tgt_mask"]], 0)

    for frac, bc in ((0.34, 512), (0.25, 512), (0.34, 1024)):
        spec = bench_spec(n0, knn_band_frac=frac, knn_band_chunk=bc,
                          approx_knn=False)
        out = build_pyramid(pts, msk, spec)
        radii = spec.level_radii()
        print(f"=== frac={frac} chunk={bc} ===", flush=True)
        for lvl in range(len(out["points"])):
            p, m = out["points"][lvl], out["masks"][lvl]
            ns = p.shape[1]
            k = int(spec.neighborhood_limits[lvl])
            # conv table at this level
            full = jax.vmap(lambda q, qm, s, sm: radius_knn(
                q, qm, s, sm, radius=radii[lvl], k=k))(p, m, p, m)
            rec, tot = table_recall(
                np.asarray(full).reshape(-1, k),
                np.asarray(out["neighbors"][lvl]).reshape(-1, k), ns)
            print(f"  L{lvl} conv  ns={ns:6d} recall={rec:.4f} "
                  f"(n_true={tot})", flush=True)
            if lvl + 1 < len(out["points"]):
                q, qm = out["points"][lvl + 1], out["masks"][lvl + 1]
                full = jax.vmap(lambda a, b, c, d: radius_knn(
                    a, b, c, d, radius=radii[lvl], k=k))(q, qm, p, m)
                rec, tot = table_recall(
                    np.asarray(full).reshape(-1, k),
                    np.asarray(out["pools"][lvl]).reshape(-1, k), ns)
                print(f"  L{lvl} pool  ns={ns:6d} recall={rec:.4f} "
                      f"(n_true={tot})", flush=True)


if __name__ == "__main__":
    main()
