"""Portable params-only snapshots (.npz).

Orbax checkpoints are large (they mirror the optimizer state) and live
in gitignored `logs/`; a host reset loses them (a round-3 incident lost
every trained model). A snapshot keeps just what evaluation needs —
params + batch_stats + step — in one compressed npz small enough to
commit to git; with include_opt=True it additionally carries the
optimizer state (written by the final graceful-stop mirror) so a
post-reset training resume loses nothing. `test.py --resume`,
`Trainer.test`, and `InferenceEngine` accept a snapshot path anywhere
a checkpoint directory is accepted.

No reference counterpart (the reference's .pth checkpoints are already
single files, cvhelpers/torch_helpers.py:98-242); this is the rebuild's
durability story for the stateless-host environment.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SECTIONS = ("params", "batch_stats")


def _flat_with_keys(tree) -> Dict[str, Any]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): leaf for path, leaf in flat}


def save_params_npz(path: str, state, meta: Optional[Dict] = None,
                    include_opt: bool = False) -> None:
    """Write params/batch_stats/step (+ scalar metadata) of a TrainState
    (or host snapshot of one) as one compressed npz.

    include_opt=True additionally serializes the optimizer state
    (Adam moments + schedule counters) so a resume loses nothing —
    ~3x the archive size, used for the final graceful-stop mirror
    only (the hourly mirrors stay params-only)."""
    arrs: Dict[str, np.ndarray] = {}
    for section in _SECTIONS:
        tree = getattr(state, section)
        for key, leaf in _flat_with_keys(tree).items():
            arrs[f"{section}::{key}"] = np.asarray(leaf)
    if include_opt:
        for key, leaf in _flat_with_keys(state.opt_state).items():
            if leaf is None:
                continue
            arrs[f"opt_state::{key}"] = np.asarray(leaf)
    arrs["__step__"] = np.asarray(int(jax.device_get(state.step)))
    for k, v in (meta or {}).items():
        arrs[f"__meta::{k}__"] = np.asarray(v)
    np.savez_compressed(path, **arrs)


def atomic_save_params_npz(path: str, state, meta: Optional[Dict] = None,
                           include_opt: bool = False) -> None:
    """save_params_npz via a same-directory tempfile + os.replace, so
    concurrent readers (the durability git-committer) never observe a
    half-written archive."""
    import os
    tmp = path + ".tmp"
    save_params_npz(tmp, state, meta, include_opt=include_opt)
    # np.savez_compressed appends .npz when missing
    if not os.path.exists(tmp) and os.path.exists(tmp + ".npz"):
        tmp = tmp + ".npz"
    os.replace(tmp, path)


def load_params_npz(path: str, state_template) -> Tuple[Any, int]:
    """Restore a snapshot into `state_template`'s structure (leaves may
    be abstract ShapeDtypeStructs from `create_train_state(...,
    abstract=True)`). If the archive was written with include_opt=True
    AND its optimizer layout matches the template's, opt_state is
    restored too (full resume: Adam moments + schedule position);
    otherwise the template's fresh opt_state is kept and a warning is
    logged."""
    import logging
    data = np.load(path)

    def rebuild(section: str, tree):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for p, leaf in flat:
            key = f"{section}::{jax.tree_util.keystr(p)}"
            if key not in data:
                raise KeyError(
                    f"snapshot {path} is missing {key} — model structure "
                    "changed since it was written")
            arr = data[key]
            if tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"snapshot leaf {key} has shape {arr.shape}, model "
                    f"expects {leaf.shape}")
            leaves.append(jnp.asarray(arr, dtype=leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    params = rebuild("params", state_template.params)
    batch_stats = rebuild("batch_stats", state_template.batch_stats)
    step = int(data["__step__"])
    replace = dict(params=params, batch_stats=batch_stats,
                   step=jnp.asarray(step, dtype=jnp.int32))
    if any(k.startswith("opt_state::") for k in data.files):
        log = logging.getLogger(__name__)
        try:
            replace["opt_state"] = rebuild("opt_state",
                                           state_template.opt_state)
            log.info("snapshot %s: optimizer state restored (full resume)",
                     path)
        except (KeyError, ValueError) as e:
            log.warning("snapshot %s has opt_state but it does not match "
                        "the current optimizer (%s); starting fresh",
                        path, e)
    state = state_template.replace(**replace)
    return state, step


def snapshot_meta(path: str) -> Dict[str, float]:
    data = np.load(path)
    out = {"step": int(data["__step__"])}
    for k in data.files:
        if k.startswith("__meta::"):
            out[k[len("__meta::"):-2]] = float(data[k])
    return out
