"""DGR protocol + evo conversion tests."""
import os
import sys

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from fgfusion_tpu.benchmark import benchmark_3dmatch_rr as rr
from fgfusion_tpu.benchmark.benchmark_dgr import benchmark_dgr
from fgfusion_tpu.geometry import se3_np

GT_ROOT = os.path.join(os.path.dirname(__file__), "..",
                       "datasets", "3dmatch", "benchmarks", "3DMatch")


@pytest.mark.skipif(not os.path.isdir(GT_ROOT), reason="gt logs not present")
def test_dgr_perfect_and_corrupted(tmp_path):
    scene = sorted(os.listdir(GT_ROOT))[0]
    src = os.path.join(GT_ROOT, scene)
    pairs, traj = rr.read_trajectory(os.path.join(src, "gt.log"))

    gt_dir = tmp_path / "gt" / scene
    gt_dir.mkdir(parents=True)
    os.symlink(os.path.abspath(os.path.join(src, "gt.log")), gt_dir / "gt.log")

    # perfect estimates -> success 1.0
    rr.write_est_log(str(tmp_path / "est" / scene / "est.log"),
                     [tuple(map(int, p)) for p in pairs], traj)
    report, success = benchmark_dgr(str(tmp_path / "est"), str(tmp_path / "gt"))
    assert success == pytest.approx(1.0)

    # corrupt all poses by 30 deg -> success 0.0
    bad = traj.copy()
    rot = Rotation.from_euler("x", 30, degrees=True).as_matrix()
    for i in range(len(bad)):
        bad[i, :3, :3] = rot @ bad[i, :3, :3]
    est2 = tmp_path / "est2" / scene
    rr.write_est_log(str(est2 / "est.log"),
                     [tuple(map(int, p)) for p in pairs], bad)
    _, success2 = benchmark_dgr(str(tmp_path / "est2"), str(tmp_path / "gt"))
    assert success2 == 0.0


def test_convert_evo_roundtrip(tmp_path, rng):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_evo import convert

    poses = []
    lines = []
    for i in range(5):
        p = se3_np.sample_pose_small(rng, std=0.3)
        p44 = np.concatenate([p, [[0, 0, 0, 1]]], 0)
        poses.append(p44)
        lines.append(f"{i} {i + 1} 5")
        for row in p44:
            lines.append(" ".join(f"{v:.9f}" for v in row))
    pose_log = tmp_path / "pose.log"
    pose_log.write_text("\n".join(lines) + "\n")

    out = tmp_path / "traj.txt"
    convert(str(pose_log), str(out))
    rows = np.loadtxt(out)
    assert rows.shape == (5, 8)
    for i, p44 in enumerate(poses):
        t = rows[i, 1:4]
        q = rows[i, 4:8]  # xyzw
        np.testing.assert_allclose(t, p44[:3, 3], atol=1e-6)
        R = Rotation.from_quat(q).as_matrix()
        np.testing.assert_allclose(R, p44[:3, :3], atol=1e-6)
