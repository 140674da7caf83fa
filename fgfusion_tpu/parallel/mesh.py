"""Device mesh + sharding specs.

The reference is single-process/single-GPU (SURVEY.md §2.10: no
torch.distributed anywhere); scaling here is data-parallel over a 1-D
`jax.sharding.Mesh` axis 'data'. Parameters and optimizer state are
replicated; the pair batch (and the stacked 2B cloud axis) is sharded
on 'data'. XLA inserts the gradient psum over ICI — there is no
hand-written collective code, by design.

The registration model is small (tens of M params) so TP/PP are
unnecessary; the mesh is still constructed via Mesh/NamedSharding so a
model-parallel axis can be added without touching call sites.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch / stacked-cloud) axis."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch with leading-axis sharding on the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
