"""Derived pyramid quantities.

`compute_overlaps` builds the GT-overlap pyramid by average-pooling the
level-0 overlap masks through the pooling index tables, with
shadow-index masking (reference: finegrained_kpconv.py:545-571). The
same approximation caveats apply: it relies on the capped pooling
tables and does an unweighted average per level.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp


def compute_overlaps(overlap0: jax.Array, meta: Dict) -> List[jax.Array]:
    """
    Args:
        overlap0: (C, N0) float GT overlap at level 0 (0 on padding).
        meta: pyramid dict from ops.build_pyramid.

    Returns:
        list of (C, N_l) per-level overlaps, clipped to [0, 1].
    """
    pyr = [overlap0.astype(jnp.float32)]
    n_levels = len(meta["points"])
    for p in range(1, n_levels):
        pools = meta["pools"][p - 1]              # (C, N_p, K) into level p-1
        prev = pyr[p - 1]                         # (C, N_{p-1})
        n_prev = prev.shape[1]
        valid = pools < n_prev
        safe = jnp.clip(pools, 0, n_prev - 1)
        gathered = jnp.take_along_axis(
            prev[:, :, None], safe.reshape(prev.shape[0], -1, 1), axis=1
        ).reshape(pools.shape)
        gathered = gathered * valid
        count = jnp.clip(jnp.sum(valid, axis=-1), 1, None)
        pooled = jnp.sum(gathered, axis=-1) / count
        pyr.append(jnp.clip(pooled, 0.0, 1.0) * meta["masks"][p])
    return pyr
