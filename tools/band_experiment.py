"""Measure neighbor-index band widths under spatial sorting.

Question for the banded gather kernel (STATUS.md round-2 lever (a)):
after sorting each pyramid level spatially, how wide is the support-
index band that covers all neighbors of a tile of TILE_Q consecutive
queries?  The kernel's window W must cover the p99.9 tile band (with a
fallback for overflow tiles).

Orders compared: input order (random), voxel-lex order (what
grid_subsample emits), morton (bit-interleaved) order.
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from fgfusion_tpu.ops.neighbors import radius_knn
from fgfusion_tpu.ops.sorting import morton_order


def scene_cloud(n, seed):
    """Indoor-scene-ish cloud: points on a few planes + clutter, ~3m box."""
    rng = np.random.default_rng(seed)
    n_wall = n // 3
    pts = []
    for ax in range(3):  # three walls
        p = rng.uniform(0, 3.0, size=(n_wall // 3 * 2, 3)).astype(np.float32)
        p[:, ax] = rng.normal(0, 0.01, size=p.shape[0])
        pts.append(p)
    pts.append(rng.uniform(0, 3.0, size=(n - sum(len(p) for p in pts), 3)).astype(np.float32))
    return np.concatenate(pts)[:n]


def band_stats(order_name, pts, radius, k, tile_q):
    n = pts.shape[0]
    mask = jnp.ones((n,), bool)
    idx = np.asarray(radius_knn(jnp.asarray(pts), mask, jnp.asarray(pts), mask,
                                radius=radius, k=k))
    valid = idx < n
    bands = []
    for t0 in range(0, n, tile_q):
        ti = idx[t0:t0 + tile_q]
        tv = valid[t0:t0 + tile_q]
        if not tv.any():
            continue
        lo, hi = ti[tv].min(), ti[tv].max()
        bands.append(hi - lo + 1)
    bands = np.array(bands)
    print(f"{order_name:12s} tile={tile_q:4d} band p50={np.percentile(bands,50):7.0f} "
          f"p90={np.percentile(bands,90):7.0f} p99={np.percentile(bands,99):7.0f} "
          f"max={bands.max():7.0f}  (n={n})")
    return bands


def main():
    n, radius, k, tile = 12288, 0.0625 * 2.75, 34, 256
    pts = scene_cloud(n, 0)

    band_stats("input-order", pts, radius, k, tile)

    order = np.asarray(morton_order(jnp.asarray(pts), jnp.ones((n,), bool)))
    band_stats("morton", pts[order], radius, k, tile)

    # voxel-lex at the conv cell size (what grid_subsample emits)
    cell = 2 * radius / 2.75
    key = np.floor(pts / cell).astype(np.int64)
    lex = np.lexsort((key[:, 2], key[:, 1], key[:, 0]))
    band_stats("voxel-lex", pts[lex], radius, k, tile)

    for t in (128, 512):
        order = np.asarray(morton_order(jnp.asarray(pts), jnp.ones((n,), bool)))
        band_stats("morton", pts[order], radius, k, t)


if __name__ == "__main__":
    main()
