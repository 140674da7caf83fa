"""Page-count statistics for the paged one-hot gather kernel.

For each pyramid level of the bench workload (Gaussian blob, 12k bucket,
K=40), after Morton-sorting level 0: how many distinct PAGE-row pages of
the support table does a tile of TILE_Q consecutive queries touch?
The paged gather kernel's cost is rows x (P_max * PAGE) x D, so P_max
(the static per-tile page capacity) is the whole game.
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from fgfusion_tpu.ops.pyramid import PyramidSpec, build_pyramid
from fgfusion_tpu.ops.sorting import sort_cloud
from __graft_entry__ import _make_batch


def page_stats(name, idx, ns, tile_q, page):
    """idx (C, Nq, K) sentinel ns."""
    c, nq, k = idx.shape
    counts = []
    spans = []
    for ci in range(c):
        for t0 in range(0, nq, tile_q):
            ti = idx[ci, t0:t0 + tile_q]
            tv = ti[ti < ns]
            if tv.size == 0:
                counts.append(0)
                continue
            counts.append(len(np.unique(tv // page)))
            spans.append(tv.max() - tv.min() + 1)
    counts = np.array(counts)
    spans = np.array(spans) if spans else np.array([0])
    print(f"{name:14s} ns={ns:6d} tile={tile_q:4d} page={page:4d} "
          f"pages p50={np.percentile(counts,50):4.0f} p90={np.percentile(counts,90):4.0f} "
          f"p99={np.percentile(counts,99):4.0f} max={counts.max():4d} | "
          f"span p50={np.percentile(spans,50):6.0f} max={spans.max():6d}")


def main():
    spec = PyramidSpec(
        architecture=("simple", "resnetb", "resnetb_strided", "resnetb",
                      "resnetb", "resnetb_strided", "resnetb", "resnetb",
                      "resnetb_strided", "resnetb", "resnetb"),
        first_subsampling_dl=0.025, conv_radius=2.5,
        neighborhood_limits=(40, 40, 40, 40),
        capacities=(12288, 4096, 1536, 576))
    batch = _make_batch(b=1, n0=12288)
    pts = jnp.concatenate([batch["src_xyz"], batch["tgt_xyz"]], axis=0)
    msk = jnp.concatenate([batch["src_mask"], batch["tgt_mask"]], axis=0)

    for order_name in ("input", "morton"):
        print(f"== level-0 order: {order_name}")
        if order_name == "morton":
            outs = [sort_cloud(pts[c], msk[c]) for c in range(pts.shape[0])]
            p = jnp.stack([o[0] for o in outs])
            m = jnp.stack([o[1] for o in outs])
        else:
            p, m = pts, msk
        meta = jax.jit(build_pyramid, static_argnames="spec")(p, m, spec)
        for l, idx in enumerate(meta["neighbors"]):
            idx = np.asarray(idx)
            ns = meta["points"][l].shape[1]
            for tile_q, page in ((128, 256), (256, 256), (128, 128)):
                page_stats(f"conv L{l}", idx, ns, tile_q, page)
        for l, idx in enumerate(meta["pools"]):
            idx = np.asarray(idx)
            ns = meta["points"][l].shape[1]
            page_stats(f"pool L{l}->{l+1}", idx, ns, 128, 256)


if __name__ == "__main__":
    main()
