"""Property tests for SE(3) math and Kabsch (reference semantics:
utils/se3_torch.py)."""
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from fgfusion_tpu.geometry import (
    se3_cat, se3_compare, se3_init, se3_inv, se3_transform,
    compute_rigid_transform, fast_compute_rigid_transform, sinkhorn,
)
from fgfusion_tpu.geometry import se3_np


def random_pose(rng, batch=()):
    rot = Rotation.random(int(np.prod(batch)) if batch else None,
                          random_state=np.random.RandomState(42)).as_matrix()
    rot = rot.reshape(batch + (3, 3))
    trans = rng.normal(size=batch + (3, 1)).astype(np.float32)
    return np.concatenate([rot.astype(np.float32), trans], axis=-1)


def test_se3_inv_roundtrip(rng):
    pose = random_pose(rng, (5,))
    ident = se3_cat(jnp.asarray(pose), se3_inv(jnp.asarray(pose)))
    np.testing.assert_allclose(np.asarray(ident[..., :3, :3]),
                               np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ident[..., :, 3]), 0, atol=1e-5)


def test_se3_transform_matches_numpy(rng):
    pose = random_pose(rng)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    out_j = np.asarray(se3_transform(jnp.asarray(pose), jnp.asarray(xyz)))
    out_n = se3_np.se3_transform(pose, xyz)
    np.testing.assert_allclose(out_j, out_n, atol=1e-5)


def test_se3_compare_zero_for_same(rng):
    pose = random_pose(rng, (4,))
    err = se3_compare(jnp.asarray(pose), jnp.asarray(pose))
    np.testing.assert_allclose(np.asarray(err["rot_deg"]), 0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(err["trans"]), 0, atol=1e-5)


def test_kabsch_recovers_known_pose(rng):
    pose = random_pose(rng)
    a = rng.normal(size=(64, 3)).astype(np.float32)
    b = se3_np.se3_transform(pose, a)
    est = np.asarray(compute_rigid_transform(jnp.asarray(a), jnp.asarray(b)))
    err = se3_np.se3_compare(est, pose)
    assert err["rot_deg"] < 0.1
    assert err["trans"] < 1e-3


def test_kabsch_weight_zero_ignores_outliers(rng):
    pose = random_pose(rng)
    a = rng.normal(size=(64, 3)).astype(np.float32)
    b = se3_np.se3_transform(pose, a)
    # corrupt half the points but zero their weights
    b_bad = b.copy()
    b_bad[32:] += 100.0
    w = np.ones(64, np.float32)
    w[32:] = 0.0
    est = np.asarray(compute_rigid_transform(jnp.asarray(a), jnp.asarray(b_bad),
                                             jnp.asarray(w)))
    err = se3_np.se3_compare(est, pose)
    assert err["rot_deg"] < 0.1
    assert err["trans"] < 1e-3


def test_kabsch_batched(rng):
    poses = random_pose(rng, (6, 2))
    a = rng.normal(size=(6, 2, 50, 3)).astype(np.float32)
    b = se3_np.se3_transform(poses, a)
    est = np.asarray(compute_rigid_transform(jnp.asarray(a), jnp.asarray(b)))
    err = se3_np.se3_compare(est, poses)
    assert np.max(err["rot_deg"]) < 0.1


def test_kabsch_det_plus_one_reflection_case():
    # Degenerate planar points can trigger the reflection branch.
    a = np.array([[1, 0, 0], [0, 1, 0], [-1, 0, 0], [0, -1, 0]], np.float32)
    b = a[:, [1, 0, 2]].copy()  # reflection-like correspondence
    est = np.asarray(compute_rigid_transform(jnp.asarray(a), jnp.asarray(b)))
    assert np.linalg.det(est[:3, :3]) > 0.9


def test_fast_kabsch_gates_low_confidence(rng):
    pose = random_pose(rng)
    a = rng.normal(size=(64, 3)).astype(np.float32)
    b = se3_np.se3_transform(pose, a)
    b_bad = b.copy()
    b_bad[40:] += 50.0
    w = np.full(64, 0.99, np.float32)
    w[40:] = 0.5  # below the 0.85 gate -> excluded
    est = np.asarray(fast_compute_rigid_transform(jnp.asarray(a), jnp.asarray(b_bad),
                                                  jnp.asarray(w)))
    err = se3_np.se3_compare(est, pose)
    assert err["rot_deg"] < 0.1


def test_fast_kabsch_fallback_when_all_gated(rng):
    pose = random_pose(rng)
    a = rng.normal(size=(32, 3)).astype(np.float32)
    b = se3_np.se3_transform(pose, a)
    w = np.full(32, 0.5, np.float32)  # all below threshold
    est = np.asarray(fast_compute_rigid_transform(jnp.asarray(a), jnp.asarray(b),
                                                  jnp.asarray(w)))
    assert np.all(np.isfinite(est))
    err = se3_np.se3_compare(est, pose)
    assert err["rot_deg"] < 0.1


def test_sinkhorn_rows_cols_substochastic(rng):
    log_alpha = jnp.asarray(rng.normal(size=(2, 5, 7)).astype(np.float32))
    out = np.exp(np.asarray(sinkhorn(log_alpha, n_iters=20)))
    assert np.all(out.sum(axis=2) <= 1.0 + 1e-4)
    assert np.all(out.sum(axis=1) <= 1.0 + 1e-4)


def test_so3_exp_log_roundtrip(rng):
    from fgfusion_tpu.geometry.so3 import so3_exp, so3_log, se3_exp, se3_log
    omega = rng.normal(size=(10, 3)).astype(np.float32)
    omega = omega / np.linalg.norm(omega, axis=-1, keepdims=True)
    omega = omega * rng.uniform(0.01, 3.0, size=(10, 1)).astype(np.float32)
    R = so3_exp(jnp.asarray(omega))
    back = np.asarray(so3_log(R))
    np.testing.assert_allclose(back, omega, atol=1e-3)

    xi = rng.normal(size=(8, 6)).astype(np.float32) * 0.5
    pose = se3_exp(jnp.asarray(xi))
    xi_back = np.asarray(se3_log(pose))
    np.testing.assert_allclose(xi_back, xi, atol=1e-3)


def test_so3_exp_matches_scipy(rng):
    from fgfusion_tpu.geometry.so3 import so3_exp
    v = rng.normal(size=(5, 3)).astype(np.float32)
    R_j = np.asarray(so3_exp(jnp.asarray(v)))
    R_s = Rotation.from_rotvec(v).as_matrix()
    np.testing.assert_allclose(R_j, R_s, atol=1e-5)
