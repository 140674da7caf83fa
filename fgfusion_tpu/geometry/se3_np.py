"""Numpy SE(3)/SO(3) helpers for the host-side data pipeline.

Mirrors the jnp API in `se3.py` on (..., 3, 4) pose arrays, plus random
pose sampling used by the training augmentations (reference:
cvhelpers/lie/numpy/se3.py:25-44, so3.py:30-38,
data_loaders/transforms.py:28-37).
"""
from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation

_EPS = 1e-6


def se3_init(rot=None, trans=None) -> np.ndarray:
    assert rot is not None or trans is not None
    if rot is None:
        rot = np.broadcast_to(np.eye(3, dtype=trans.dtype), trans.shape[:-2] + (3, 3))
    if trans is None:
        trans = np.zeros(rot.shape[:-1] + (1,), dtype=rot.dtype)
    return np.concatenate([rot, trans], axis=-1)


def se3_cat(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    rot_a, trans_a = a[..., :3, :3], a[..., :3, 3:4]
    rot_b, trans_b = b[..., :3, :3], b[..., :3, 3:4]
    return se3_init(rot_a @ rot_b, rot_a @ trans_b + trans_a)


def se3_inv(pose: np.ndarray) -> np.ndarray:
    rot, trans = pose[..., :3, :3], pose[..., :3, 3:4]
    irot = np.swapaxes(rot, -1, -2)
    return se3_init(irot, -irot @ trans)


def se3_transform(pose: np.ndarray, xyz: np.ndarray) -> np.ndarray:
    rot, trans = pose[..., :3, :3], pose[..., :3, 3:4]
    return np.einsum("...ij,...nj->...ni", rot, xyz) + np.swapaxes(trans, -1, -2)


def se3_compare(a: np.ndarray, b: np.ndarray):
    combined = se3_cat(a, se3_inv(b))
    trace = combined[..., 0, 0] + combined[..., 1, 1] + combined[..., 2, 2]
    rot_deg = np.degrees(np.arccos(np.clip(0.5 * (trace - 1), -1.0, 1.0)))
    trans_err = np.linalg.norm(combined[..., :, 3], axis=-1)
    return {"rot_deg": rot_deg, "trans": trans_err}


def uniform_2_sphere(rng: np.random.Generator, size=None) -> np.ndarray:
    """Uniform direction(s) on the unit sphere."""
    shape = (3,) if size is None else (size, 3)
    v = rng.normal(size=shape)
    return v / np.clip(np.linalg.norm(v, axis=-1, keepdims=True), _EPS, None)


def sample_pose_small(rng: np.random.Generator, std: float = 0.1) -> np.ndarray:
    """Small random rigid perturbation (3x4).

    Rotation: random axis, angle ~ N(0, (std*pi/sqrt(3))^2);
    translation ~ N(0, (std/sqrt(3))^2) per axis.
    Reference: cvhelpers/lie/numpy/so3.py:30-38, se3.py:38-44.
    """
    axis = uniform_2_sphere(rng)
    theta = rng.normal() * std * np.pi / np.sqrt(3)
    rot = Rotation.from_rotvec(axis * theta).as_matrix()
    trans = rng.normal(size=(3, 1)) * std / np.sqrt(3)
    return se3_init(rot, trans).astype(np.float32)


def sample_pose_large(rng: np.random.Generator) -> np.ndarray:
    """Predator-style full random rotation, zero translation (3x4).

    Reference: data_loaders/transforms.py:28-33 (euler zyx in [0, 2pi)).
    """
    euler = rng.random(3) * np.pi * 2
    rot = Rotation.from_euler("zyx", euler).as_matrix()
    return se3_init(rot, np.zeros((3, 1))).astype(np.float32)


def sample_rot_trans_euler(rng: np.random.Generator, rot_mag: float, trans_mag: float):
    """RPMNet/ModelNet-style bounded random transform.

    Euler angles uniform in [-rot_mag, rot_mag] deg per axis, translation
    uniform in [-trans_mag, trans_mag] per axis (reference:
    data_loaders/modelnet_transforms.py:316-355).
    """
    anglex, angley, anglez = rng.uniform(-1.0, 1.0, 3) * np.radians(rot_mag)
    rot = Rotation.from_euler("zyx", [anglez, angley, anglex]).as_matrix()
    trans = rng.uniform(-trans_mag, trans_mag, size=(3, 1))
    return se3_init(rot, trans).astype(np.float32)
