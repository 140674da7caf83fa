"""Masked normalization layers.

The reference applies InstanceNorm1d *per point cloud* by slicing the
packed (N_total, C) stack with stack_lengths
(finegrained_kpconv_blocks.py:498-507) — a python loop over clouds. In
the fixed-shape design features are (C, N, D) with a validity mask, so
per-cloud normalization is a single masked mean/var over the point
axis; no loop, no dynamic shapes.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_EPS = 1e-5  # torch InstanceNorm1d/BatchNorm1d default eps


def masked_mean_var(x, mask, axes):
    """Mean/var of x over `axes`, counting only mask==True positions.
    Statistics always accumulate in f32 (bf16 feature tensors would
    lose too much precision in the variance)."""
    x = x.astype(jnp.float32)
    m = mask[..., None].astype(x.dtype)
    count = jnp.clip(jnp.sum(m, axis=axes, keepdims=True), 1.0, None)
    mean = jnp.sum(x * m, axis=axes, keepdims=True) / count
    var = jnp.sum(jnp.square(x - mean) * m, axis=axes, keepdims=True) / count
    return mean, var


class MaskedInstanceNorm(nn.Module):
    """Per-cloud, per-channel normalization without affine params
    (torch nn.InstanceNorm1d defaults: affine=False, eps=1e-5).

    x: (C, N, D), mask: (C, N) -> normalized over the N axis of each
    cloud independently.
    """

    @nn.compact
    def __call__(self, x, mask):
        mean, var = masked_mean_var(x, mask, axes=(1,))
        y = (x.astype(jnp.float32) - mean) / jnp.sqrt(var + _EPS)
        return jnp.where(mask[..., None], y, 0.0)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all valid points of all clouds jointly, with
    affine params and running stats (torch nn.BatchNorm1d semantics on
    the packed (N_total, D) stack, as used inside the Res2Net fusion —
    reference res2net.py:101,113,118).

    x: (C, N, D), mask: (C, N). Running stats live in the
    'batch_stats' collection; `use_running_average` switches train/eval.
    """

    momentum: float = 0.1  # torch default
    features: int = 0

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool = False):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))

        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((d,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((d,), jnp.float32))

        if use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        else:
            m, v = masked_mean_var(x, mask, axes=(0, 1))
            mean, var = m.reshape(d), v.reshape(d)
            if not self.is_initializing():
                # torch uses the *unbiased* variance for running stats
                cnt = jnp.clip(jnp.sum(mask), 2.0, None)
                unbiased = var * cnt / (cnt - 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (x.astype(jnp.float32) - mean) / jnp.sqrt(var + _EPS) * scale + bias
        return jnp.where(mask[..., None], y, 0.0)
