"""Unit tests for the correspondence-loss variants
(fgfusion_tpu/losses/corr_loss.py), incl. the my_CorrCriterion parity
path (reference models/losses/corr_loss.py:98-190)."""
import numpy as np
import jax.numpy as jnp

from fgfusion_tpu.losses.corr_loss import (balanced_bce, corr_criterion,
                                           my_corr_criterion,
                                           unbalanced_bce)


def _bce(logit, label):
    return max(logit, 0.0) - logit * label + np.log1p(np.exp(-abs(logit)))


def test_balanced_bce_matches_manual():
    logits = np.array([2.0, -1.0, 0.5, -0.2, 3.0])
    labels = np.array([1, 0, 1, 0, 1])
    mask = np.array([True, True, True, True, False])
    per = [_bce(l, y) for l, y in zip(logits, labels)]
    cls0 = np.mean([per[1], per[3]])
    cls1 = np.mean([per[0], per[2]])
    want = (cls0 + cls1) / 2.0
    got = float(balanced_bce(jnp.asarray(logits), jnp.asarray(labels),
                             jnp.asarray(mask)))
    assert abs(got - want) < 1e-6


def test_balanced_bce_absent_class():
    # all-ones labels: class 0 absent -> contributes 0 (reference skips
    # it via torch.any), so the loss is mean(cls1 BCE) / 2
    logits = np.array([1.0, -2.0])
    labels = np.array([1, 1])
    mask = np.array([True, True])
    want = np.mean([_bce(l, 1) for l in logits]) / 2.0
    got = float(balanced_bce(jnp.asarray(logits), jnp.asarray(labels),
                             jnp.asarray(mask)))
    assert abs(got - want) < 1e-6


def test_unbalanced_bce_masked_mean():
    logits = np.array([0.3, -0.7, 5.0])
    labels = np.array([1, 0, 1])
    mask = np.array([True, True, False])
    want = np.mean([_bce(0.3, 1), _bce(-0.7, 0)])
    got = float(unbalanced_bce(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(mask)))
    assert abs(got - want) < 1e-6


def _setup_pair(rng, b=2, n=16):
    kp = rng.normal(size=(b, n, 3)).astype(np.float32)
    pose = np.tile(np.eye(4, dtype=np.float32)[:3], (b, 1, 1))
    pose[:, :3, 3] = rng.normal(size=(b, 3)).astype(np.float32) * 0.1
    w = rng.uniform(size=(b, n)).astype(np.float32)
    return kp, pose, w


def test_my_corr_without_logits_equals_corr():
    rng = np.random.default_rng(0)
    kp, pose, w = _setup_pair(rng)
    pred = kp + 0.05 * rng.normal(size=kp.shape).astype(np.float32)
    a = float(corr_criterion(kp, pred, pose, w))
    b = float(my_corr_criterion(kp, pred, pose, w))
    assert abs(a - b) < 1e-6


def test_my_corr_inlier_labels_perfect_prediction():
    # pred == gt warp: every point is its own nearest neighbor -> all
    # labels 1, so the inlier term is balanced BCE with only class 1
    rng = np.random.default_rng(1)
    kp, pose, w = _setup_pair(rng)
    from fgfusion_tpu.geometry.se3 import se3_transform
    pred = np.asarray(se3_transform(pose, kp))
    mask = np.ones(kp.shape[:2], bool)
    logits = np.full(kp.shape[:2], 4.0, np.float32)
    base = float(corr_criterion(kp, pred, pose, w))
    got = float(my_corr_criterion(kp, pred, pose, w, inlier_logits=logits,
                                  mask=mask))
    want_inlier = _bce(4.0, 1) / 2.0
    assert abs(got - (base + want_inlier)) < 1e-5


def test_my_corr_padding_invariance():
    rng = np.random.default_rng(2)
    kp, pose, w = _setup_pair(rng, n=12)
    pred = kp + 0.05 * rng.normal(size=kp.shape).astype(np.float32)
    mask = np.ones(kp.shape[:2], bool)
    logits = rng.normal(size=kp.shape[:2]).astype(np.float32)
    a = float(my_corr_criterion(kp, pred, pose, w, inlier_logits=logits,
                                mask=mask))

    def pad(x, v=0.0):
        extra = np.full((x.shape[0], 5) + x.shape[2:], v, x.dtype)
        return np.concatenate([x, extra], axis=1)

    b = float(my_corr_criterion(
        pad(kp, 1e6), pad(pred, 1e6), pose, pad(w, 0.0),
        inlier_logits=pad(logits, -9.0),
        mask=np.concatenate([mask, np.zeros((2, 5), bool)], axis=1)))
    assert abs(a - b) < 1e-5
