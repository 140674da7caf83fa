"""Data-pipeline tests: ModelNet pair generation invariants,
augmentations preserving GT-pose consistency, collate shapes, and the
overlap computation."""
import numpy as np
import pytest

from fgfusion_tpu.data.buckets import collate_pairs, capacity_schedule, pad_cloud
from fgfusion_tpu.data.modelnet import ModelNetPairGenerator
from fgfusion_tpu.data.transforms import (Compose, Jitter, RandomSwap,
                                          RigidPerturb, ShufflePoints,
                                          train_transforms)
from fgfusion_tpu.geometry import se3_np
from fgfusion_tpu.utils.pointcloud import compute_overlap


def sphere_cloud(rng, n=512):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    normals = v.copy()
    return np.concatenate([v, normals], axis=1).astype(np.float32)


def check_pair_consistency(sample, atol=0.05):
    """GT pose must map src onto tgt for the correspondent points."""
    corr = sample["correspondences"]
    src_w = se3_np.se3_transform(sample["pose"], sample["src_xyz"][corr[0]])
    err = np.linalg.norm(src_w - sample["tgt_xyz"][corr[1]], axis=1)
    # jitter is clipped at 0.05 per cloud -> 2 * 0.05 * sqrt(3) worst case
    assert np.median(err) < atol * 4


def test_modelnet_generator_crop(rng):
    gen = ModelNetPairGenerator(noise_type="crop", num_points=1024,
                                partial=[0.7, 0.7])
    sample = gen(sphere_cloud(rng, 2048), rng)
    assert sample["src_xyz"].shape == (717, 3)   # Predator-parity size
    assert sample["tgt_xyz"].shape == (717, 3)
    assert sample["src_overlap"].shape == (717,)
    assert 0.3 < sample["src_overlap"].mean() <= 1.0
    check_pair_consistency(sample)


def test_modelnet_generator_asymmetric_partial(rng):
    """ref must be cropped with p_keep[1], not p_keep[0] (round-1 bug:
    both sides used partial[0])."""
    gen = ModelNetPairGenerator(noise_type="crop", num_points=1024,
                                partial=[0.9, 0.3], jitter_scale=0.0)
    raw = sphere_cloud(rng, 2048)
    # intercept the crop result before resampling: run the crop stage
    # statistics via overlap fractions of the generated sample.
    sample = gen(raw, np.random.default_rng(3))
    # src keeps 90% of a sphere while ref keeps 30%: every surviving ref
    # point has its src twin present with high probability, while most
    # src points lost their ref twin.
    assert sample["tgt_overlap"].mean() > 0.75
    assert sample["src_overlap"].mean() < 0.55
    check_pair_consistency(sample)


def test_modelnet_generator_single_element_partial(rng):
    """1-element p_keep crops only src; resample sizes follow
    reference modelnet_transforms.py:86-88."""
    gen = ModelNetPairGenerator(noise_type="crop", num_points=1024,
                                partial=[0.7])
    sample = gen(sphere_cloud(rng, 2048), np.random.default_rng(5))
    assert sample["src_xyz"].shape == (int(np.ceil(0.7 * 1024)), 3)
    assert sample["tgt_xyz"].shape == (1024, 3)
    assert sample["tgt_overlap"].mean() < 1.0  # some ref pts lost src twin
    assert sample["src_overlap"].mean() == 1.0  # ref uncropped: all src survive
    check_pair_consistency(sample)


def test_modelnet_generator_clean_and_jitter(rng):
    for noise_type, n_expect in (("clean", 2048), ("jitter", 800)):
        gen = ModelNetPairGenerator(noise_type=noise_type, num_points=800)
        sample = gen(sphere_cloud(rng, 2048), rng)
        if noise_type == "clean":
            assert sample["src_xyz"].shape[0] == 2048  # clean: no resample here
        else:
            assert sample["src_xyz"].shape[0] == 800
        check_pair_consistency(sample)


def test_modelnet_deterministic_per_index(rng):
    gen = ModelNetPairGenerator(noise_type="crop")
    raw = sphere_cloud(rng, 2048)
    a = gen(raw, np.random.default_rng(7))
    b = gen(raw, np.random.default_rng(7))
    np.testing.assert_array_equal(a["src_xyz"], b["src_xyz"])
    np.testing.assert_array_equal(a["pose"], b["pose"])


def make_scan_pair(rng, n=400):
    src = rng.normal(size=(n, 3)).astype(np.float32)
    pose = se3_np.sample_pose_small(rng, std=0.3)
    tgt = se3_np.se3_transform(pose, src).astype(np.float32)
    return {
        "src_xyz": src.copy(), "tgt_xyz": tgt.copy(), "pose": pose,
        "src_overlap": np.ones(n, bool), "tgt_overlap": np.ones(n, bool),
        "correspondences": np.tile(np.arange(n), (2, 1)),
    }


@pytest.mark.parametrize("transform", [
    RigidPerturb("small"), RigidPerturb("large"), Jitter(0.0),
    ShufflePoints(300), RandomSwap(),
])
def test_transforms_preserve_gt_consistency(rng, transform):
    data = make_scan_pair(rng)
    data = transform(data, rng)
    corr = data["correspondences"]
    src_w = se3_np.se3_transform(data["pose"], data["src_xyz"][corr[0]])
    err = np.linalg.norm(src_w - data["tgt_xyz"][corr[1]], axis=1)
    assert np.max(err) < 1e-4


def test_full_train_transform_chain(rng):
    cfg = {"perturb_pose": "small", "augment_noise": 0.005, "max_pts": 350}
    chain = train_transforms(cfg)
    data = chain(make_scan_pair(rng), rng)
    assert data["src_xyz"].shape[0] <= 350
    corr = data["correspondences"]
    src_w = se3_np.se3_transform(data["pose"], data["src_xyz"][corr[0]])
    err = np.linalg.norm(src_w - data["tgt_xyz"][corr[1]], axis=1)
    assert np.median(err) < 0.03  # jitter-limited


def test_collate_shapes_and_truncation(rng):
    samples = [make_scan_pair(rng, n=100), make_scan_pair(rng, n=300)]
    batch = collate_pairs(samples, n0=256, rng=rng)
    assert batch["src_xyz"].shape == (2, 256, 3)
    assert batch["src_mask"].sum(1).tolist() == [100, 256]  # second truncated
    assert batch["pose"].shape == (2, 3, 4)
    # padding is the far sentinel
    assert np.all(batch["src_xyz"][0, 100:] == 1e6)


def test_capacity_schedule():
    caps = capacity_schedule(16384, 4)
    assert caps[0] == 16384
    assert all(caps[i] > caps[i + 1] for i in range(3))
    assert all(c % 64 == 0 for c in caps[1:])


def test_compute_overlap_mutual(rng):
    src = rng.normal(size=(200, 3)).astype(np.float32)
    tgt = np.vstack([src[:100] + rng.normal(scale=1e-3, size=(100, 3)),
                     rng.normal(size=(150, 3)) + 20.0]).astype(np.float32)
    src_ov, tgt_ov, corr = compute_overlap(src, tgt, 0.05)
    assert src_ov[:100].mean() > 0.95
    assert src_ov[100:].mean() < 0.05
    assert tgt_ov[100:].mean() < 0.05
    # correspondences are mutual and correct
    assert np.all(corr[1] == corr[0])
