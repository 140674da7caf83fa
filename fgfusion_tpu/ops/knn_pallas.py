"""Fused approximate kNN: distances + candidate selection in one
Pallas kernel, d2 never touches HBM.

Why: the preprocess kNN is the forward's largest block (~18 ms @12k).
Its floor in the XLA formulation is the (Nq, Ns) distance matrix's HBM
round trip — matmul writes it, approx_max_k reads it back (~3.6 GB per
forward at the 12k bench shapes). This kernel keeps each distance tile
in VMEM and reduces it immediately to per-segment minima, so HBM sees
only queries, supports, and a (Ns/SEG, Nq) candidate sheet.

Algorithm (per query tile of TQ, supports resident in VMEM):
  for each support chunk S:
      d2 = s2 - 2 * s @ qT + q2            # (S, TQ), MXU cross term
      view (S/SEG, SEG, TQ); min + argmin over the SEG axis
      append (S/SEG) candidate rows (value + global support index)
Selection error matches lax.approx_max_k's recall model: a true
neighbor is lost only when a closer true neighbor shares its SEG-row
segment (recall ~0.95-0.98 at the shipped shapes, see
tests/test_knn_pallas.py); the reference's own GPU path keeps an
arbitrary first-K in-radius subset (pytorch3d ball_query,
finegrained_kpconv.py:285-293), so this is no less faithful.

The exact top-k over the ~Ns/SEG candidates per query, the radius
test, and the shadow-sentinel fill run in XLA on the small candidate
sheet (ops/neighbors.py:radius_knn wires this in for approx mode).

Layout note: distances are computed support-major, (S, TQ) — segments
live on the SUBLANE axis where Mosaic reshapes/reductions are free,
and each chunk writes one dense (S/SEG, TQ) block instead of per-
segment lane columns.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick(n: int, choices) -> int:
    for c in choices:
        if n % c == 0:
            return c
    return 1


def seg_for(ns: int) -> int:
    """Segment width: ~Ns/768 candidates kept, at least 4, dividing Ns."""
    if ns >= 8192:
        target = 16
    elif ns >= 2048:
        target = 8
    else:
        target = 4
    return _pick(ns, [target, target // 2, 4, 2, 1])


def _kernel(q_ref, s_ref, s2_ref, dout_ref, iout_ref, *,
            s_chunk: int, seg: int, tq: int):
    q = q_ref[:]                                         # (TQ, 3)
    q2 = jnp.sum(q * q, axis=1)[None, :]                 # (1, TQ)
    ns = s_ref.shape[0]
    keep_per_chunk = s_chunk // seg
    for c in range(ns // s_chunk):
        s = s_ref[c * s_chunk:(c + 1) * s_chunk, :]      # (S, 3)
        s2 = s2_ref[c * s_chunk:(c + 1) * s_chunk, :]    # (S, 1)
        cross = jax.lax.dot_general(
            s, q, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # (S, TQ)
        d2 = s2 - 2.0 * cross + q2                       # (S, TQ)
        d2 = d2.reshape(keep_per_chunk, seg, tq)
        m = jnp.min(d2, axis=1)                          # (keep, TQ)
        # argmin via one-hot + iota (no native argmin in Mosaic)
        sub = jax.lax.broadcasted_iota(jnp.int32,
                                       (keep_per_chunk, seg, tq), 1)
        arg = jnp.min(jnp.where(d2 == m[:, None, :], sub, seg), axis=1)
        base = (c * s_chunk
                + jax.lax.broadcasted_iota(jnp.int32,
                                           (keep_per_chunk, tq), 0) * seg)
        sl = slice(c * keep_per_chunk, (c + 1) * keep_per_chunk)
        dout_ref[sl, :] = m
        iout_ref[sl, :] = base + arg


@functools.partial(jax.jit, static_argnames=("tile_q", "s_chunk", "seg",
                                             "interpret"))
def knn_candidates(queries: jax.Array, supports: jax.Array,
                   s_norm2: jax.Array, *, tile_q: int | None = None,
                   s_chunk: int | None = None, seg: int | None = None,
                   interpret: bool | None = None):
    """Per-segment candidate sheet for approximate kNN.

    Args:
        queries: (Nq, 3) f32.
        supports: (Ns, 3) f32.
        s_norm2: (Ns,) f32 — support squared norms with invalid
            supports already pushed to a huge value (see radius_knn).

    Returns:
        d2: (Nq, Ns/SEG) f32 candidate squared distances.
        idx: (Nq, Ns/SEG) int32 support indices.
    """
    nq, ns = queries.shape[0], supports.shape[0]
    if seg is None:
        seg = seg_for(ns)
    if tile_q is None:
        # Mosaic block constraint: the trailing (lane) block dim must be
        # a multiple of 128 or the full array dim. (Only enforced in
        # real TPU lowering — interpret mode accepts anything, so keep
        # this policy in sync with tests/test_knn_pallas.py.)
        tile_q = next((c for c in (256, 128) if nq % c == 0), nq)
    if s_chunk is None:
        s_chunk = _pick(ns, [2048, 1536, 1024, 512, 256, 128, 64, 32])
    assert s_chunk % seg == 0, (s_chunk, seg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_keep = ns // seg

    d2, idx = pl.pallas_call(
        functools.partial(_kernel, s_chunk=s_chunk, seg=seg, tq=tile_q),
        grid=(nq // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, 3), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 3), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_keep, tile_q), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_keep, tile_q), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_keep, nq), jnp.float32),
            jax.ShapeDtypeStruct((n_keep, nq), jnp.int32),
        ),
        interpret=interpret,
    )(queries, supports, s_norm2[:, None])
    return d2.T, idx.T
