"""Tests for the evaluation protocols:
- RR protocol returns recall 1.0 when est == gt on the shipped
  3DMatch gt logs, and degrades under corruption (SURVEY.md §4(f));
- ModelNet metrics are ~0 for perfect predictions.
"""
import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from fgfusion_tpu.benchmark import benchmark_3dmatch_rr as rr
from fgfusion_tpu.benchmark import benchmark_modelnet as bm
from fgfusion_tpu.geometry import se3_np

GT_ROOT = os.path.join(os.path.dirname(__file__), "..",
                       "datasets", "3dmatch", "benchmarks", "3DMatch")


@pytest.mark.skipif(not os.path.isdir(GT_ROOT), reason="gt logs not present")
def test_rr_perfect_est_gives_full_recall(tmp_path):
    scenes = sorted(os.listdir(GT_ROOT))[:2]  # two scenes is enough
    gt_dir = tmp_path / "gt"
    est_dir = tmp_path / "est"
    for scene in scenes:
        src = os.path.join(GT_ROOT, scene)
        pairs, traj = rr.read_trajectory(os.path.join(src, "gt.log"))
        (gt_dir / scene).mkdir(parents=True)
        os.symlink(os.path.abspath(os.path.join(src, "gt.log")),
                   gt_dir / scene / "gt.log")
        os.symlink(os.path.abspath(os.path.join(src, "gt.info")),
                   gt_dir / scene / "gt.info")
        rr.write_est_log(str(est_dir / scene / "est.log"),
                         [tuple(map(int, p)) for p in pairs], traj)

    report, recall = rr.benchmark(str(est_dir), str(gt_dir))
    assert recall == pytest.approx(1.0), report
    assert "Weighted recall" in report


@pytest.mark.skipif(not os.path.isdir(GT_ROOT), reason="gt logs not present")
def test_rr_partial_sweep_missing_ok(tmp_path):
    """missing_ok=True scores only the scenes with an est.log (the
    graceful-stop partial-salvage mode); default mode raises."""
    scenes = sorted(os.listdir(GT_ROOT))[:2]
    gt_dir = tmp_path / "gt"
    est_dir = tmp_path / "est"
    for scene in scenes:
        src = os.path.join(GT_ROOT, scene)
        (gt_dir / scene).mkdir(parents=True)
        os.symlink(os.path.abspath(os.path.join(src, "gt.log")),
                   gt_dir / scene / "gt.log")
        os.symlink(os.path.abspath(os.path.join(src, "gt.info")),
                   gt_dir / scene / "gt.info")
    # est.log only for the FIRST scene (sweep stopped early)
    src = os.path.join(GT_ROOT, scenes[0])
    pairs, traj = rr.read_trajectory(os.path.join(src, "gt.log"))
    rr.write_est_log(str(est_dir / scenes[0] / "est.log"),
                     [tuple(map(int, p)) for p in pairs], traj)

    with pytest.raises(FileNotFoundError):
        rr.benchmark(str(est_dir), str(gt_dir))

    report, recall = rr.benchmark(str(est_dir), str(gt_dir), missing_ok=True)
    assert recall == pytest.approx(1.0), report
    assert "PARTIAL" in report and scenes[1] in report


@pytest.mark.skipif(not os.path.isdir(GT_ROOT), reason="gt logs not present")
def test_rr_corrupted_est_lowers_recall(tmp_path):
    scene = sorted(os.listdir(GT_ROOT))[0]
    src = os.path.join(GT_ROOT, scene)
    pairs, traj = rr.read_trajectory(os.path.join(src, "gt.log"))
    bad = traj.copy()
    # corrupt half of the poses with a 90 deg rotation + 2 m shift
    corrupt = Rotation.from_euler("z", 90, degrees=True).as_matrix()
    for i in range(0, len(bad), 2):
        bad[i, :3, :3] = corrupt @ bad[i, :3, :3]
        bad[i, :3, 3] += 2.0

    gt_dir = tmp_path / "gt" / scene
    gt_dir.mkdir(parents=True)
    os.symlink(os.path.abspath(os.path.join(src, "gt.log")), gt_dir / "gt.log")
    os.symlink(os.path.abspath(os.path.join(src, "gt.info")), gt_dir / "gt.info")
    rr.write_est_log(str(tmp_path / "est" / scene / "est.log"),
                     [tuple(map(int, p)) for p in pairs], bad)

    _, recall = rr.benchmark(str(tmp_path / "est"), str(tmp_path / "gt"))
    assert 0.3 < recall < 0.7


def test_transformation_error_zero_for_identity():
    info = np.eye(6) * 100.0
    assert rr.transformation_error(np.eye(4), info) == pytest.approx(0.0)


def test_modelnet_metrics_zero_for_perfect(rng):
    b, n = 4, 64
    raw = rng.normal(size=(b, n, 3)).astype(np.float32)
    gt = np.stack([se3_np.sample_pose_small(rng, std=0.3) for _ in range(b)])
    src = raw.copy()
    ref = se3_np.se3_transform(gt, raw)
    # predicted == gt
    m = bm.compute_metrics(gt, gt, src, ref, ref)
    s = bm.summarize_metrics(m)
    assert s["err_r_deg_mean"] < 1e-3
    assert s["err_t_mean"] < 1e-5
    assert s["r_rmse"] < 1e-2


def test_modelnet_metrics_nonzero_for_wrong(rng):
    b, n = 2, 64
    raw = rng.normal(size=(b, n, 3)).astype(np.float32)
    gt = np.stack([se3_np.sample_pose_small(rng, std=0.3) for _ in range(b)])
    pred = np.stack([se3_np.sample_pose_small(rng, std=0.3) for _ in range(b)])
    ref = se3_np.se3_transform(gt, raw)
    m = bm.compute_metrics(gt, pred, raw, ref, ref)
    s = bm.summarize_metrics(m)
    assert s["err_r_deg_mean"] > 0.5
