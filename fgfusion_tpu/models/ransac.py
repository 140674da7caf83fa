"""Batched (differentiable) RANSAC for rigid 3D registration, on device.

TPU-native equivalent of the 3D subset of the reference's vendored
nabla-RANSAC subproject (models/ransaclib: RANSAC3D ransac.py:303-488,
RigidTransformationSVDBasedSolver
estimators/rigid_transformation_SVD_based_solver.py:4-98,
GumbelSoftmaxSampler samplers/gumbel_sampler.py:9-46). Design
differences:

- all hypotheses are drawn and solved at once as one batched Kabsch
  (vmapped SVD over the hypothesis axis) instead of a python loop with
  adaptive termination — fixed iteration count keeps the graph static
  and saturates the MXU/VPU;
- sampling is either uniform or Gumbel-softmax over correspondence
  confidence logits (straight-through hard top-k), so gradients can
  flow back into the confidence head when used as a training-time
  refinement layer;
- scoring is inlier counting or MSAC (truncated squared residual).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import compute_rigid_transform, se3_transform


def gumbel_softmax_topk(logits: jax.Array, k: int, key: jax.Array,
                        tau: float = 1.0, hard: bool = True) -> jax.Array:
    """Differentiable top-k subset selection (straight-through).

    Returns selection weights (..., N) with k (soft)ones. Reference:
    samplers/gumbel_sampler.py:9-46.
    """
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, logits.shape, minval=1e-9, maxval=1.0) + 1e-9))
    scores = (logits + gumbel) / tau
    soft = jax.nn.softmax(scores, axis=-1)
    if not hard:
        return soft
    _, idx = jax.lax.top_k(scores, k)
    hard_sel = jax.nn.one_hot(idx, logits.shape[-1], dtype=soft.dtype).sum(-2)
    return hard_sel + soft - jax.lax.stop_gradient(soft)


def squared_residuals(pose: jax.Array, src: jax.Array, tgt: jax.Array) -> jax.Array:
    """(..., 3, 4) pose, (..., N, 3) points -> (..., N) squared errors.
    Reference: rigid_transformation_SVD_based_solver.py:78-98."""
    warped = se3_transform(pose, src)
    return jnp.sum(jnp.square(warped - tgt), axis=-1)


def ransac_rigid(
    src: jax.Array,
    tgt: jax.Array,
    key: jax.Array,
    weights: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    num_hypotheses: int = 256,
    min_set: int = 3,
    inlier_threshold: float = 0.03,
    scoring: str = "inliers",
    refit: bool = True,
    sampler: str = "uniform",
    tau: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-pair RANSAC; vmap for batches.

    Args:
        src, tgt: (N, 3) putative correspondences.
        key: PRNG key.
        weights: optional (N,) confidences — sampling distribution
            (logits when sampler='gumbel', probabilities otherwise).
        mask: optional (N,) validity (padding = False).
        num_hypotheses: static hypothesis count (reference draws 64 per
            adaptive iteration; here all at once).
        inlier_threshold: residual threshold (meters); reference default
            sqrt(0.03²)≈0.03.
        scoring: 'inliers' or 'msac'.
        refit: re-estimate on the best hypothesis's inliers.
        sampler: 'uniform' or 'gumbel'.

    Returns:
        pose (3, 4), inlier mask (N,), best score ().
    """
    n = src.shape[0]
    valid = jnp.ones(n, bool) if mask is None else mask
    thr2 = inlier_threshold ** 2

    if weights is None:
        logits = jnp.zeros(n)
    else:
        logits = jnp.log(jnp.clip(weights, 1e-9, None)) \
            if sampler != "gumbel" else weights
    logits = jnp.where(valid, logits, -1e9)

    keys = jax.random.split(key, num_hypotheses + 1)
    hyp_keys, refit_key = keys[:-1], keys[-1]
    del refit_key

    if sampler == "gumbel":
        # Gumbel-top-k = sampling min_set items without replacement with
        # probability proportional to softmax(logits / tau)
        def sample_idx(k_):
            g = -jnp.log(-jnp.log(jax.random.uniform(
                k_, logits.shape, minval=1e-9, maxval=1.0) + 1e-9))
            return jax.lax.top_k((logits + g) / tau, min_set)[1]
        idx = jax.vmap(sample_idx)(hyp_keys)
    else:
        idx = jax.vmap(
            lambda k_: jax.random.choice(k_, n, (min_set,), replace=False,
                                         p=jax.nn.softmax(logits)))(hyp_keys)

    src_min = src[idx]                     # (H, m, 3)
    tgt_min = tgt[idx]
    poses = compute_rigid_transform(src_min, tgt_min)   # (H, 3, 4)

    res2 = jax.vmap(lambda p: squared_residuals(p, src, tgt))(poses)  # (H, N)
    res2 = jnp.where(valid[None], res2, jnp.inf)

    if scoring == "msac":
        score = -jnp.sum(jnp.minimum(res2, thr2), axis=-1)
    else:
        score = jnp.sum(res2 < thr2, axis=-1).astype(jnp.float32)

    best = jnp.argmax(score)
    best_pose = poses[best]
    inliers = (res2[best] < thr2) & valid

    if refit:
        w = inliers.astype(src.dtype)
        enough = jnp.sum(w) >= min_set
        refit_pose = compute_rigid_transform(src, tgt, w)
        best_pose = jnp.where(enough, refit_pose, best_pose)
        inliers = (squared_residuals(best_pose, src, tgt) < thr2) & valid

    return best_pose, inliers, score[best]


def weighted_inlier_score(pose, src, tgt, weights=None, mask=None,
                          threshold: float = 0.05):
    """Confidence-weighted inlier count of `pose` on correspondences.

    pose (..., 3, 4), src/tgt (..., N, 3) -> (...,). Used to SELECT
    between the learned gated-Kabsch pose and the RANSAC hypothesis
    per pair (the measured trade-off: RANSAC wins low-overlap pairs,
    the learned pose wins high-inlier ones — STATUS.md round 3). The
    reference always takes the RANSAC output when refinement is on
    (models/ransaclib/ransac.py:303); selection is a strict
    generalization, scored by the same residual threshold.
    """
    res2 = squared_residuals(pose, src, tgt)           # (..., N)
    inl = (res2 < threshold * threshold).astype(src.dtype)
    if weights is not None:
        inl = inl * weights
    if mask is not None:
        inl = inl * mask.astype(src.dtype)
    return jnp.sum(inl, axis=-1)


def ransac_rigid_batch(src, tgt, key, **kwargs):
    """vmapped over the leading batch axis; keys split per pair."""
    b = src.shape[0]
    keys = jax.random.split(key, b)
    weights = kwargs.pop("weights", None)
    mask = kwargs.pop("mask", None)

    def one(s, t, k_, w, m):
        return ransac_rigid(s, t, k_, weights=w, mask=m, **kwargs)

    w_ax = None if weights is None else 0
    m_ax = None if mask is None else 0
    return jax.vmap(one, in_axes=(0, 0, 0, w_ax, m_ax))(
        src, tgt, keys, weights, mask)
