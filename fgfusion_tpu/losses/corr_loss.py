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
