"""MCD pipeline tests: synthetic LiDAR generator -> PCD -> .pth ->
pair pkls -> MCDDataset, with GT relative poses verified geometrically.

Covers reference parity for data_loaders/mcd.py + data_processing/MCD/*
(SURVEY rows 47/51) on a tiny generated sequence.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mcd_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mcd_synth"))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synthetic_mcd.py"),
         "--root", root, "--frames", "16", "--n_az", "720", "--n_el", "32"],
        check=True, env=env, cwd=REPO, capture_output=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/mcd/pcd_to_samplepth.py"),
         "--data_root", root, "--stride", "1"],
        check=True, env=env, cwd=REPO, capture_output=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/mcd/create_mcd_pkl.py"),
         "--data_root", root, "--prefix", "mcd_synth",
         "--overlap_radius", "0.05", "--min_overlap", "0.1",
         "--max_gap", "2", "--train_ratio", "0.6"],
        check=True, env=env, cwd=REPO, capture_output=True)
    return root


def test_pcd_roundtrip(mcd_root):
    """The binary PCD writer/reader pair preserves the cloud EXACTLY
    (regression: the original reader mis-parsed interleaved binary
    records as contiguous per-field arrays)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from mcd.pcd_to_samplepth import read_pcd_xyz
    from make_synthetic_mcd import write_pcd
    pcds = sorted(os.listdir(os.path.join(mcd_root, "cloud_inBody_mergeFrame")))
    pcds = [p for p in pcds if p.endswith(".pcd")]
    assert len(pcds) == 16
    pts = read_pcd_xyz(os.path.join(mcd_root, "cloud_inBody_mergeFrame",
                                    pcds[0]))
    assert pts.ndim == 2 and pts.shape[1] == 3 and len(pts) > 200
    assert np.all(np.isfinite(pts))

    ref = np.random.default_rng(0).normal(size=(777, 3)).astype(np.float32)
    path = os.path.join(mcd_root, "roundtrip.pcd")
    write_pcd(path, ref)
    np.testing.assert_array_equal(read_pcd_xyz(path), ref)


def test_mcd_dataset_loads_and_poses_align(mcd_root):
    from fgfusion_tpu.data.mcd import MCDDataset
    from fgfusion_tpu.geometry import se3_np
    from scipy.spatial import cKDTree

    cfg = {"root": mcd_root, "mcd_pkl_pattern": "mcd_synth_{phase}.pkl",
           "overlap_radius": 0.05}
    ds = MCDDataset(cfg, "train")
    assert len(ds) > 0
    s = ds[0]
    for k in ("src_xyz", "tgt_xyz", "pose", "src_overlap", "tgt_overlap"):
        assert k in s, k
    assert s["src_xyz"].shape[1] == 3
    assert s["pose"].shape == (3, 4)

    # the GT relative pose must actually align src onto tgt. Absolute
    # NN distances reflect the fixture's sparse ray grid, so the check
    # is discriminative: the GT pose must beat a 20-degree-perturbed
    # pose by a wide margin, and its lower quartile must sit at the
    # near-field sampling scale.
    tree = cKDTree(s["tgt_xyz"])
    aligned = se3_np.se3_transform(s["pose"], s["src_xyz"])
    d_pose, _ = tree.query(aligned, k=1)
    # tilt about x: a yaw perturbation would keep the (dominant)
    # ground points on the ground plane and barely move the NN stats
    a = np.radians(20.0)
    dR = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                   [0, np.sin(a), np.cos(a)]], np.float32)
    bad = s["pose"].copy()
    bad[:3, :3] = dR @ bad[:3, :3]
    d_bad, _ = tree.query(se3_np.se3_transform(bad, s["src_xyz"]), k=1)
    assert float(np.quantile(d_pose, 0.25)) < 0.1
    assert np.median(d_pose) < 0.4 * np.median(d_bad), (
        float(np.median(d_pose)), float(np.median(d_bad)))
    # overlap masks are meaningful (some in, not everything)
    assert 0.05 < s["src_overlap"].mean() <= 1.0


def test_mcd_trajectory_chaining_identity(mcd_root):
    """Chaining the GT relative poses reproduces the GT world
    trajectory (the algebra eval_mcd_rmse relies on: with x_j = T_rel
    x_i, T_world_j = T_world_i @ T_rel^{-1})."""
    import pickle

    with open(os.path.join(mcd_root, "mcd_synth_train.pkl"), "rb") as f:
        infos = pickle.load(f)

    def world_pose(rel_path):
        rows = [[float(v) for v in line.split()] for line in
                open(os.path.join(mcd_root,
                                  rel_path.replace(".pth", ".txt"))
                     ).readlines()[:3]]
        T = np.eye(4)
        T[:3] = np.asarray(rows)
        return T

    k = 0  # first pair
    T_i = world_pose(infos["src"][k])
    T_j = world_pose(infos["tgt"][k])
    T_rel = np.eye(4)
    T_rel[:3, :3] = infos["rot"][k]
    T_rel[:3, 3] = np.asarray(infos["trans"][k]).ravel()
    np.testing.assert_allclose(T_i @ np.linalg.inv(T_rel), T_j, atol=1e-9)
