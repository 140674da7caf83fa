"""Learned inlier-confidence network for correspondence filtering.

TPU-native analogue of the reference's vendored CLNet /
DeepRansac_CLNet (models/ransaclib/model_cl.py:449-655): a PointCN-style
residual MLP over per-correspondence features with *context
normalization* (per-set instance norm across the correspondence axis),
producing inlier logits that (a) gate a weighted Kabsch solve and
(b) feed the Gumbel sampler of `ransac.py` for differentiable
hypothesis sampling.

Input features per correspondence: [src_xyz, tgt_xyz] (6D), optionally
plus side information (e.g. the registration head's overlap scores).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry.se3 import compute_rigid_transform
from .res2net import torch_linear_init


class ContextNorm(nn.Module):
    """Normalize each feature channel across the correspondence set
    (masked), the PointCN 'context normalization'."""

    @nn.compact
    def __call__(self, x, mask):
        m = mask[..., None].astype(x.dtype)
        count = jnp.clip(jnp.sum(m, axis=-2, keepdims=True), 1.0, None)
        mean = jnp.sum(x * m, axis=-2, keepdims=True) / count
        var = jnp.sum(jnp.square(x - mean) * m, axis=-2, keepdims=True) / count
        y = (x - mean) / jnp.sqrt(var + 1e-5)
        return jnp.where(mask[..., None], y, 0.0)


class PointCNBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, mask):
        h = ContextNorm(name="cn1")(x, mask)
        h = nn.relu(nn.Dense(self.dim, kernel_init=torch_linear_init,
                             name="fc1")(h))
        h = ContextNorm(name="cn2")(h, mask)
        h = nn.Dense(self.dim, kernel_init=torch_linear_init, name="fc2")(h)
        if x.shape[-1] != self.dim:
            x = nn.Dense(self.dim, kernel_init=torch_linear_init,
                         name="skip")(x)
        return nn.relu(x + h)


class CLNet(nn.Module):
    """Correspondence -> inlier logit. (B, N, F) + mask -> (B, N)."""

    dim: int = 128
    num_blocks: int = 4

    @nn.compact
    def __call__(self, feats, mask):
        h = nn.Dense(self.dim, kernel_init=torch_linear_init, name="inp")(feats)
        for i in range(self.num_blocks):
            h = PointCNBlock(self.dim, name=f"block_{i}")(h, mask)
        logits = nn.Dense(1, kernel_init=torch_linear_init,
                          name="head")(h)[..., 0]
        return jnp.where(mask, logits, -1e9)


class DeepRansacCLNet(nn.Module):
    """CLNet + weighted Kabsch refinement (reference
    RANSACLayer3D/DeepRansac_CLNet model_cl.py:449-655, 3D path):
    predicted inlier probabilities weight a differentiable SVD solve.
    """

    dim: int = 128
    num_blocks: int = 4

    @nn.compact
    def __call__(self, src_xyz, tgt_xyz, mask,
                 side_info: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
        feats = jnp.concatenate([src_xyz, tgt_xyz], axis=-1)
        if side_info is not None:
            feats = jnp.concatenate([feats, side_info], axis=-1)
        logits = CLNet(self.dim, self.num_blocks, name="clnet")(feats, mask)
        weights = jax.nn.sigmoid(logits) * mask.astype(src_xyz.dtype)
        pose = compute_rigid_transform(src_xyz, tgt_xyz, weights)
        return pose, logits
