"""SO(3)/SE(3) exponential & logarithm maps (jnp).

Parity with the reference's Lie classes (cvhelpers/lie/): the training
pipeline only uses small-pose sampling (in se3_np), but exp/log are part
of the geometry surface and useful for pose interpolation/averaging.
"""
from __future__ import annotations

import jax.numpy as jnp

from .se3 import axis_angle_to_matrix, skew  # noqa: F401 (re-export)

_EPS = 1e-8


def so3_log(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle vector (..., 3)."""
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos)

    # off-diagonal antisymmetric part
    w = jnp.stack([
        rot[..., 2, 1] - rot[..., 1, 2],
        rot[..., 0, 2] - rot[..., 2, 0],
        rot[..., 1, 0] - rot[..., 0, 1],
    ], axis=-1)

    small = theta < 1e-4
    # near 0: w / 2 * (1 + theta^2/6); away: theta / (2 sin theta) * w
    scale_small = 0.5 * (1.0 + theta[..., None] ** 2 / 6.0)
    sin = jnp.sin(theta)
    scale_big = theta[..., None] / jnp.where(
        jnp.abs(2.0 * sin[..., None]) < _EPS, _EPS, 2.0 * sin[..., None])
    omega = jnp.where(small[..., None], w * scale_small, w * scale_big)

    # theta ~ pi needs the diagonal formula
    near_pi = theta > 3.1
    diag = jnp.stack([rot[..., 0, 0], rot[..., 1, 1], rot[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag + 1.0) / 2.0, 0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    # fix signs from the off-diagonals
    sign = jnp.sign(jnp.stack([
        rot[..., 2, 1] - rot[..., 1, 2],
        rot[..., 0, 2] - rot[..., 2, 0],
        rot[..., 1, 0] - rot[..., 0, 1],
    ], axis=-1))
    sign = jnp.where(sign == 0, 1.0, sign)
    omega_pi = axis * sign * theta[..., None]
    return jnp.where(near_pi[..., None], omega_pi, omega)


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (Rodrigues)."""
    return axis_angle_to_matrix(omega)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Twist (..., 6) = [rho, omega] -> pose (..., 3, 4)."""
    rho, omega = xi[..., :3], xi[..., 3:]
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    R = so3_exp(omega)
    K = skew(omega / jnp.where(theta < _EPS, 1.0, theta))
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + ((1 - jnp.cos(th)) / jnp.where(th < _EPS, 1.0, th)) * K \
        + ((th - jnp.sin(th)) / jnp.where(th < _EPS, 1.0, th)) * (K @ K)
    V = jnp.where(th < _EPS, eye, V)
    t = jnp.einsum("...ij,...j->...i", V, rho)[..., None]
    return jnp.concatenate([R, t], axis=-1)


def se3_log(pose: jnp.ndarray) -> jnp.ndarray:
    """Pose (..., 3, 4) -> twist (..., 6) = [rho, omega]."""
    R, t = pose[..., :3, :3], pose[..., :3, 3]
    omega = so3_log(R)
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    K = skew(omega / jnp.where(theta < _EPS, 1.0, theta))
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pose.dtype), R.shape)
    half = 0.5 * th
    cot = jnp.where(th < _EPS, 1.0, half / jnp.tan(half))
    V_inv = eye - 0.5 * th * K + (1.0 - cot) * (K @ K)
    V_inv = jnp.where(th < _EPS, eye, V_inv)
    rho = jnp.einsum("...ij,...j->...i", V_inv, t)
    return jnp.concatenate([rho, omega], axis=-1)
