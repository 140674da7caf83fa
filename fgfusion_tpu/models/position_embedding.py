"""Position embeddings for point coordinates.

Reference: models/transformer/position_embedding.py. Batch-first
(B, N, 3) -> (B, N, d_model) with padding slots zeroed by the caller's
mask where needed (sine embedding of the 1e6 sentinel is harmless
because every consumer masks attention/outputs).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .res2net import torch_linear_init


class PositionEmbeddingCoordsSine(nn.Module):
    """NeRF-style sine/cos over each coordinate
    (reference position_embedding.py:8-49): d_model//n_dim//2*2
    frequencies per coordinate, zero-padded to d_model; coords scaled by
    scale * 2*pi."""

    n_dim: int = 3
    d_model: int = 256
    temperature: float = 10000.0
    scale: float = 1.0

    @nn.compact
    def __call__(self, xyz):
        num_feats = self.d_model // self.n_dim // 2 * 2
        padding = self.d_model - num_feats * self.n_dim

        dim_t = jnp.arange(num_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / num_feats)

        pos = xyz * (self.scale * 2 * math.pi)
        pos = pos[..., None] / dim_t                     # (..., 3, F)
        sin = jnp.sin(pos[..., 0::2])
        cos = jnp.cos(pos[..., 1::2])
        emb = jnp.stack([sin, cos], axis=-1).reshape(*xyz.shape[:-1], -1)
        if padding:
            emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, padding)])
        return emb


class GeometricStructureEmbedding(nn.Module):
    """GeoTransformer-style pair-distance + triplet-angle structure
    embedding (reference position_embedding.py:129-196; instantiated
    but gated off by default — finegrained_regtr.py:44). Kept for
    config-parity experiments.

    Returns per-point embeddings: for each point, the max over its k-NN
    of (sinusoidal(d/sigma_d) @ Wd + reduce_k sinusoidal(angle) @ Wa).
    """

    hidden_dim: int
    sigma_d: float = 0.2
    sigma_a: float = 15.0
    angle_k: int = 3
    reduction_a: str = "max"

    def _sinusoidal(self, x):
        d = self.hidden_dim
        div = jnp.exp(jnp.arange(0, d, 2) * (-np.log(10000.0) / d))
        ang = x[..., None] * div
        emb = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        return emb.reshape(*x.shape, d)

    @nn.compact
    def __call__(self, points):
        """points (B, N, 3) -> (B, N, hidden_dim)."""
        b, n, _ = points.shape
        k = self.angle_k
        d2 = jnp.sum((points[:, :, None] - points[:, None]) ** 2, axis=-1)
        dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
        d_indices = dist / self.sigma_d

        _, knn = jax.lax.top_k(-dist, k + 1)
        knn = knn[:, :, 1:]                                   # (B, N, k)
        knn_pts = jnp.take_along_axis(points[:, None].repeat(n, 1),
                                      knn[..., None].repeat(3, -1), axis=2)
        ref_vec = knn_pts - points[:, :, None]                # (B, N, k, 3)
        anc_vec = points[:, None] - points[:, :, None]        # (B, N, N, 3)
        cross = jnp.cross(ref_vec[:, :, None], anc_vec[:, :, :, None])
        sin_v = jnp.linalg.norm(cross, axis=-1)               # (B, N, N, k)
        cos_v = jnp.sum(ref_vec[:, :, None] * anc_vec[:, :, :, None], axis=-1)
        angles = jnp.arctan2(sin_v, cos_v)
        a_indices = angles * (180.0 / (self.sigma_a * np.pi))

        proj_d = nn.Dense(self.hidden_dim, kernel_init=torch_linear_init,
                          name="proj_d")
        proj_a = nn.Dense(self.hidden_dim, kernel_init=torch_linear_init,
                          name="proj_a")
        d_emb = proj_d(self._sinusoidal(d_indices))           # (B, N, N, D)
        a_emb = proj_a(self._sinusoidal(a_indices))           # (B, N, N, k, D)
        a_emb = (jnp.max(a_emb, axis=3) if self.reduction_a == "max"
                 else jnp.mean(a_emb, axis=3))
        emb = d_emb + a_emb                                   # (B, N, N, D)

        knn_emb = jnp.take_along_axis(
            emb, knn[..., None].repeat(self.hidden_dim, -1), axis=2)
        return jnp.max(knn_emb, axis=2)                       # (B, N, D)


class PositionEmbeddingLearned(nn.Module):
    """5-layer MLP 3 -> 32 -> 64 -> 128 -> 256 -> d_model
    (reference position_embedding.py:52-71)."""

    n_dim: int = 3
    d_model: int = 256

    @nn.compact
    def __call__(self, xyz):
        x = xyz
        for width in (32, 64, 128, 256):
            x = nn.relu(nn.Dense(width, kernel_init=torch_linear_init)(x))
        return nn.Dense(self.d_model, kernel_init=torch_linear_init)(x)
