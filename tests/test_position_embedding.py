"""Position-embedding formula parity with the reference
(position_embedding.py:8-49): per-coordinate sine/cos over
d_model//3//2*2 frequencies, interleaved sin/cos, zero-padded."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from fgfusion_tpu.models.position_embedding import (
    GeometricStructureEmbedding, PositionEmbeddingCoordsSine,
    PositionEmbeddingLearned)


def reference_sine_embedding(xyz, d_model, temperature=10000.0, scale=1.0):
    """Direct numpy transcription of the reference math."""
    n_dim = xyz.shape[-1]
    num_feats = d_model // n_dim // 2 * 2
    padding = d_model - num_feats * n_dim
    dim_t = np.arange(num_feats, dtype=np.float64)
    dim_t = temperature ** (2 * np.trunc(dim_t / 2) / num_feats)
    pos = xyz * (scale * 2 * math.pi)
    pos_divided = pos[..., None] / dim_t
    pos_sin = np.sin(pos_divided[..., 0::2])
    pos_cos = np.cos(pos_divided[..., 1::2])
    emb = np.stack([pos_sin, pos_cos], axis=-1).reshape(*xyz.shape[:-1], -1)
    if padding:
        emb = np.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, padding)])
    return emb


def test_sine_embedding_matches_reference_formula(rng):
    xyz = rng.normal(size=(2, 10, 3)).astype(np.float32)
    for d_model in (64, 256, 512):
        mod = PositionEmbeddingCoordsSine(3, d_model, scale=1.0)
        got = np.asarray(mod.apply({}, jnp.asarray(xyz)))
        want = reference_sine_embedding(xyz.astype(np.float64), d_model)
        assert got.shape == (2, 10, d_model)
        np.testing.assert_allclose(got, want, atol=2e-4)
        # zero-padding tail: d_model - (d_model//3//2*2)*3 zeros
        pad = d_model - (d_model // 3 // 2 * 2) * 3
        if pad:
            assert np.all(got[..., -pad:] == 0)


def test_sine_embedding_scale():
    xyz = jnp.ones((1, 1, 3)) * 0.25
    a = PositionEmbeddingCoordsSine(3, 96, scale=1.0).apply({}, xyz)
    b = PositionEmbeddingCoordsSine(3, 96, scale=2.0).apply({}, xyz * 0.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_learned_embedding_shapes(rng):
    mod = PositionEmbeddingLearned(3, 128)
    xyz = jnp.asarray(rng.normal(size=(2, 7, 3)).astype(np.float32))
    v = mod.init(jax.random.PRNGKey(0), xyz)
    out = mod.apply(v, xyz)
    assert out.shape == (2, 7, 128)
    # 5-layer MLP widths 32/64/128/256/d_model (reference :52-71)
    kernels = sorted(k["kernel"].shape for k in jax.tree.leaves(
        v["params"], is_leaf=lambda x: isinstance(x, dict) and "kernel" in x))
    assert kernels == [(3, 32), (32, 64), (64, 128), (128, 256), (256, 128)]


def test_geometric_embedding_rigid_invariance(rng):
    """Distance+angle structure embedding is invariant to rigid motion."""
    from fgfusion_tpu.geometry import se3_np
    mod = GeometricStructureEmbedding(hidden_dim=32)
    pts = rng.normal(size=(1, 12, 3)).astype(np.float32)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(pts))
    a = np.asarray(mod.apply(v, jnp.asarray(pts)))
    pose = se3_np.sample_pose_small(rng, std=0.5)
    moved = se3_np.se3_transform(pose, pts[0])[None]
    b = np.asarray(mod.apply(v, jnp.asarray(moved.astype(np.float32))))
    np.testing.assert_allclose(a, b, atol=2e-3)
