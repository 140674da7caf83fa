"""Tensor-parallel sharding rules for the cross-attention transformer.

The reference is single-GPU, so TP has no upstream counterpart; this is
the TPU-native scaling story beyond data-parallel (`mesh.py`): a 2-D
``(data, model)`` mesh where the transformer's weight matrices are
partitioned Megatron-style and XLA/GSPMD inserts the all-reduces over
the 'model' axis:

- q/k/v projections: output-dim split ``P(None, 'model')`` — each model
  shard owns ``nhead / tp`` attention heads end to end;
- attention out-projection and FFN second linear: input-dim split
  ``P('model', None)`` — the contraction produces partial sums and
  GSPMD inserts one psum per layer per sublayer (ride ICI, never DCN);
- FFN first linear: output-dim split;
- everything else (norms, KPConv encoder, decoders, losses):
  replicated. The registration model's encoder is gather-bound and
  small, so sharding it buys nothing; the transformer is where the
  weight matrices are.

Specs are derived from parameter *paths* (``q_proj/kernel``,
``linear1/bias``, ...) with right-aligned dims, so the same rule covers
the unrolled tree, the `scan_layers` stacked tree (leading layer axis),
and the optimizer's mu/nu mirrors (whose paths end with the same
suffixes).

No hand-written collectives anywhere, by design: we annotate shardings;
XLA chooses and schedules the collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_data: int, n_model: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh. The model axis is innermost so its
    collectives land on directly-connected neighbours of the ICI torus."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(devices)}")
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# (path-suffix match) -> spec for the trailing dims of the leaf.
# kernel shapes are (in, out); right-aligned so a scan/layer-stacked
# leading axis falls through to None.
_COL_SPLIT = ("q_proj", "k_proj", "v_proj", "linear1")   # split output dim
_ROW_SPLIT = ("out_proj", "linear2")                     # split input dim


def _spec_for_path(path) -> P:
    keys = [getattr(k, "key", str(k)) for k in path]
    name = keys[-1]
    owner = next((k for k in reversed(keys[:-1])
                  if isinstance(k, str) and not k.isdigit()), "")
    if owner in _COL_SPLIT:
        if name == "kernel":
            return P(None, "model")   # (in, out/tp)
        if name == "bias":
            return P("model")
    if owner in _ROW_SPLIT:
        if name == "kernel":
            return P("model", None)   # (in/tp, out); output is psummed
        # bias of a row-split layer is added post-reduce: replicate
    return P()


def _right_align(spec: P, ndim: int) -> P:
    dims = list(spec)
    if len(dims) > ndim:           # scalar leaves of e.g. opt_state count
        return P()
    return P(*([None] * (ndim - len(dims)) + dims))


def tp_shardings(tree, mesh: Mesh):
    """NamedSharding pytree for params / TrainState / optimizer state.

    Any leaf whose path ends in a transformer projection name gets its
    Megatron split; everything else is replicated (the 'data' axis only
    shards activations, never weights)."""
    def leaf_sharding(path, leaf):
        spec = _right_align(_spec_for_path(path), np.ndim(leaf))
        # A split dim must divide evenly; otherwise fall back to
        # replication (e.g. d_feedforward not divisible by tp).
        tp = mesh.shape.get("model", 1)
        for d, ax in zip(np.shape(leaf), spec):
            if ax == "model" and d % tp != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def shard_tree(tree, mesh: Mesh):
    """Place a pytree on the mesh under the TP rules."""
    return jax.tree.map(jax.device_put, tree, tp_shardings(tree, mesh))
