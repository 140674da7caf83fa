"""Position embeddings for point coordinates.

Reference: models/transformer/position_embedding.py. Batch-first
(B, N, 3) -> (B, N, d_model) with padding slots zeroed by the caller's
mask where needed (sine embedding of the 1e6 sentinel is harmless
because every consumer masks attention/outputs).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

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
