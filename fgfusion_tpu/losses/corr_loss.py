"""Correspondence loss: error between predicted warped keypoints and
GT-transformed keypoints, weighted by GT overlap.

Reference: models/losses/corr_loss.py:8-38 (CorrCriterion). The
reference concatenates all clouds before averaging, i.e. the mean is
over all points of the whole batch, weighted by overlap — replicated
here with masks standing in for the ragged concat (padding weight = 0).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geometry.se3 import se3_transform

_EPS = 1e-6


def corr_criterion(kp_before, kp_warped_pred, pose_gt, overlap_weights,
                   metric: str = "mae"):
    """
    Args:
        kp_before: (B, N, 3) keypoints in their original frame.
        kp_warped_pred: (B, N, 3) predicted warped keypoints.
        pose_gt: (B, 3, 4) GT transforms to apply to kp_before.
        overlap_weights: (B, N) GT overlap in [0, 1]; 0 on padding.
        metric: 'mae' (L1 over xyz) or 'mse'.

    Returns scalar: sum(w * err) / clamp(sum(w), eps) over the batch.
    """
    kp_warped_gt = se3_transform(pose_gt, kp_before)
    diff = kp_warped_pred - kp_warped_gt
    if metric == "mae":
        err = jnp.sum(jnp.abs(diff), axis=-1)
    elif metric == "mse":
        err = jnp.sum(jnp.square(diff), axis=-1)
    else:
        raise ValueError(metric)
    w = overlap_weights
    return jnp.sum(w * err) / jnp.clip(jnp.sum(w), _EPS, None)


def balanced_bce(logits, labels, mask):
    """Class-balanced binary cross-entropy: the BCE of each class is
    averaged separately, then the class means are averaged — so the
    rarer class is not drowned out (reference corr_loss.py:161-177
    BalancedLoss; data-dependent `torch.any` branches become safe
    masked denominators).

    Args:
        logits: (...,) raw inlier logits.
        labels: (...,) {0, 1} targets.
        mask: (...,) bool validity (padding = False).
    """
    labels = labels.astype(jnp.float32)
    # elementwise BCE-with-logits (stable form)
    bce = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    total = 0.0
    for cls in (0.0, 1.0):
        sel = mask & (labels == cls)
        n = jnp.sum(sel)
        # absent class contributes 0 (reference skips it via torch.any)
        total += jnp.where(n > 0, jnp.sum(jnp.where(sel, bce, 0.0))
                           / jnp.clip(n, 1, None), 0.0) / 2.0
    return total


def unbalanced_bce(logits, labels, mask):
    """Plain masked BCE-with-logits (reference corr_loss.py:150-158
    UnbalancedLoss)."""
    labels = labels.astype(jnp.float32)
    bce = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    n = jnp.clip(jnp.sum(mask), 1, None)
    return jnp.sum(jnp.where(mask, bce, 0.0)) / n


def my_corr_criterion(kp_before, kp_warped_pred, pose_gt, overlap_weights,
                      inlier_logits=None, mask=None, metric: str = "mae"):
    """CorrCriterion variant with an auxiliary inlier-classification
    term (reference corr_loss.py:98-147 my_CorrCriterion — present but
    never instantiated upstream; implemented for completeness).

    The inlier label of point i is 1 iff its predicted warp is the
    nearest neighbor of its own GT warp among all predictions of the
    same cloud (the reference's argmin-over-rows self-matching,
    corr_loss.py:119-123, computed per cloud here instead of over the
    ragged batch concat — padding is masked out of the argmin).

    Args:
        kp_before/kp_warped_pred: (B, N, 3); pose_gt: (B, 3, 4).
        overlap_weights: (B, N), 0 on padding.
        inlier_logits: optional (B, N) raw logits.
        mask: (B, N) bool; required when inlier_logits is given.
    """
    loss = corr_criterion(kp_before, kp_warped_pred, pose_gt,
                          overlap_weights, metric=metric)
    if inlier_logits is None:
        return loss
    assert mask is not None
    kp_warped_gt = se3_transform(pose_gt, kp_before)
    # (B, N, N) pairwise distances pred_i <-> gt_j, padding pushed away
    d2 = jnp.sum((kp_warped_pred[:, :, None, :]
                  - kp_warped_gt[:, None, :, :]) ** 2, axis=-1)
    big = jnp.asarray(1e12, d2.dtype)
    d2 = jnp.where(mask[:, None, :], d2, big)
    nn_ind = jnp.argmin(d2, axis=-1)                      # (B, N)
    labels = (nn_ind == jnp.arange(d2.shape[1])[None, :]) & mask
    return loss + balanced_bce(inlier_logits, labels, mask)
