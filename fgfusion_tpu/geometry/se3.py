"""SE(3) rigid-transform math on (..., 3, 4) pose tensors (JAX).

Poses are stored as 3x4 matrices [R | t] with arbitrary leading batch
dims, matching the reference convention (reference: utils/se3_torch.py).
All functions are pure and jit/vmap-friendly; SVD-based routines run in
float32 (TPU has no f64; f32 SVD is ample for 3x3 covariances).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def se3_init(rot=None, trans=None):
    """Build a 3x4 pose from rot (...,3,3) and/or trans (...,3,1)."""
    assert rot is not None or trans is not None
    if rot is not None and trans is not None:
        return jnp.concatenate([rot, trans], axis=-1)
    if rot is None:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=trans.dtype), trans.shape[:-2] + (3, 3))
        return jnp.concatenate([eye, trans], axis=-1)
    zeros = jnp.zeros(rot.shape[:-1] + (1,), dtype=rot.dtype)
    return jnp.concatenate([rot, zeros], axis=-1)


def se3_cat(a, b):
    """Compose two SE(3) transforms: result = a ∘ b."""
    rot_a, trans_a = a[..., :3, :3], a[..., :3, 3:4]
    rot_b, trans_b = b[..., :3, :3], b[..., :3, 3:4]
    rot = rot_a @ rot_b
    trans = rot_a @ trans_b + trans_a
    return se3_init(rot, trans)


def se3_inv(pose):
    rot, trans = pose[..., :3, :3], pose[..., :3, 3:4]
    irot = jnp.swapaxes(rot, -1, -2)
    itrans = -irot @ trans
    return se3_init(irot, itrans)


def se3_transform(pose, xyz):
    """Apply pose ([...,] 3, 4) to points ([...,] N, 3). Rx + t."""
    rot, trans = pose[..., :3, :3], pose[..., :3, 3:4]
    return jnp.einsum("...ij,...nj->...ni", rot, xyz) + jnp.swapaxes(trans, -1, -2)


def se3_compare(a, b):
    """Rotation (deg) and translation errors between two poses.

    Reference: utils/se3_torch.py:117-129 (trace formula).
    """
    combined = se3_cat(a, se3_inv(b))
    trace = combined[..., 0, 0] + combined[..., 1, 1] + combined[..., 2, 2]
    rot_err_deg = jnp.degrees(jnp.arccos(jnp.clip(0.5 * (trace - 1), -1.0, 1.0)))
    trans_err = jnp.linalg.norm(combined[..., :, 3], axis=-1)
    return {"rot_deg": rot_err_deg, "trans": trans_err}


def _kabsch_from_cov(cov, centroid_a, centroid_b):
    """Solve rotation from a 3x3 covariance with det-sign fix, f32 SVD."""
    cov = cov.astype(jnp.float32)
    u, s, vh = jnp.linalg.svd(cov, full_matrices=True)
    v = jnp.swapaxes(vh, -1, -2)
    rot_pos = v @ jnp.swapaxes(u, -1, -2)
    v_neg = v.at[..., :, 2].multiply(-1.0)
    rot_neg = v_neg @ jnp.swapaxes(u, -1, -2)
    det = jnp.linalg.det(rot_pos)
    rot = jnp.where(det[..., None, None] > 0, rot_pos, rot_neg)
    translation = -rot @ centroid_a[..., :, None] + centroid_b[..., :, None]
    return jnp.concatenate([rot, translation], axis=-1)


def compute_rigid_transform(a, b, weights=None):
    """Weighted Kabsch: T such that T*a ≈ b, over (..., N, 3) point sets.

    Fully batched (no per-batch python loop, unlike the reference's
    per-b list comprehension at finegrained_regtr.py:215-218).
    Invalid/padded points must carry weight 0.

    Reference semantics: utils/se3_torch.py:131-173.
    """
    if weights is None:
        weights = jnp.ones(a.shape[:-1], dtype=a.dtype)
    w = weights[..., None]
    w_sum = jnp.clip(jnp.sum(weights, axis=-1, keepdims=True)[..., None], _EPS, None)
    w_norm = w / w_sum
    centroid_a = jnp.sum(a * w_norm, axis=-2)
    centroid_b = jnp.sum(b * w_norm, axis=-2)
    a_c = a - centroid_a[..., None, :]
    b_c = b - centroid_b[..., None, :]
    cov = jnp.swapaxes(a_c, -1, -2) @ (b_c * w_norm)
    return _kabsch_from_cov(cov, centroid_a, centroid_b)


def fast_compute_rigid_transform(a, b, weights, weights_threshold=0.85):
    """Kabsch with confidence gating: weights <= threshold are zeroed
    before the weighted solve (reference: utils/se3_torch.py:226-274).

    Unlike the reference (which hard-codes CUDA and can produce a
    degenerate all-zero weight set), this falls back to the ungated
    weights when gating removes (nearly) everything, keeping the SVD
    well-posed under jit.
    """
    gated = jnp.where(weights > weights_threshold, weights, 0.0)
    # Fall back to ungated weights if < 3 points survive the gate.
    enough = jnp.sum(gated > 0, axis=-1, keepdims=True) >= 3
    safe = jnp.where(enough, gated, weights)
    return compute_rigid_transform(a, b, safe)


def sinkhorn(log_alpha, n_iters: int = 5, slack: bool = True):
    """Sinkhorn normalization in log space with slack row/col.

    Reference: utils/se3_torch.py:175-210. Input (B, J, K); the slack
    row/column are appended (zeros) and never normalized themselves.
    """
    if not slack:
        for _ in range(n_iters):
            log_alpha = log_alpha - jax.scipy.special.logsumexp(log_alpha, axis=2, keepdims=True)
            log_alpha = log_alpha - jax.scipy.special.logsumexp(log_alpha, axis=1, keepdims=True)
        return log_alpha

    padded = jnp.pad(log_alpha, ((0, 0), (0, 1), (0, 1)))
    for _ in range(n_iters):
        rows = padded[:, :-1, :] - jax.scipy.special.logsumexp(
            padded[:, :-1, :], axis=2, keepdims=True)
        padded = jnp.concatenate([rows, padded[:, -1:, :]], axis=1)
        cols = padded[:, :, :-1] - jax.scipy.special.logsumexp(
            padded[:, :, :-1], axis=1, keepdims=True)
        padded = jnp.concatenate([cols, padded[:, :, -1:]], axis=2)
    return padded[:, :-1, :-1]


def compute_rigid_transform_with_sinkhorn(xyz_s, xyz_t, affinity, slack, n_iters):
    """Soft-assignment pose solve (reference: se3_torch.py:212-223)."""
    log_perm = sinkhorn(affinity, n_iters=n_iters, slack=slack)
    perm = jnp.exp(log_perm)
    weighted_t = perm @ xyz_t / (jnp.sum(perm, axis=2, keepdims=True) + _EPS)
    return compute_rigid_transform(
        jnp.broadcast_to(xyz_s, weighted_t.shape), weighted_t,
        weights=jnp.sum(perm, axis=2))


# ---------------------------------------------------------------------------
# Random pose sampling (numpy-free, for augmentation under jax PRNG)
# ---------------------------------------------------------------------------

def rand_rotation(key, max_rot_deg=360.0):
    """Uniform-ish random rotation with bounded angle via axis-angle."""
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (3,))
    axis = axis / jnp.clip(jnp.linalg.norm(axis), _EPS, None)
    angle = jax.random.uniform(k2, ()) * jnp.radians(max_rot_deg)
    return axis_angle_to_matrix(axis * angle)


def axis_angle_to_matrix(omega):
    """Rodrigues formula, omega (..., 3)."""
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    small = theta < 1e-8
    axis = omega / jnp.where(small, 1.0, theta)
    K = skew(axis)
    theta = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    R = eye + jnp.sin(theta) * K + (1 - jnp.cos(theta)) * (K @ K)
    return jnp.where(small[..., None], eye, R)


def skew(v):
    """(..., 3) -> (..., 3, 3) skew-symmetric."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
    ], axis=-2)
