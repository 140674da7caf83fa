"""Synthetic 3DMatch generator (tools/make_synthetic_3dmatch.py) wired
through ThreeDMatchDataset and the official RR protocol: GT poses must
align fragments, the h5 overlap cache must be consistent, and a
perfect estimate must score recall 1.0 on the generated gt.log/gt.info.
"""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from fgfusion_tpu.geometry import se3_np
from fgfusion_tpu.utils.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth3dm"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synthetic_3dmatch.py"),
         "--root", root, "--train_scenes", "2", "--val_scenes", "1",
         "--test_scenes", "1", "--frags", "5"],
        check=True, cwd=REPO)
    return root


def _cfg(root, benchmark=None):
    return Config({
        "dataset": "3dmatch", "root": os.path.join(root, "data"),
        "info_dir": root, "overlap_radius": 0.0375,
        "benchmark": benchmark,
    })


def test_dataset_loads_and_gt_aligns(synth_root):
    from fgfusion_tpu.data.threedmatch import ThreeDMatchDataset
    from scipy.spatial import cKDTree
    ds = ThreeDMatchDataset(_cfg(synth_root), "train")
    assert len(ds) > 0
    assert ds.pairs_data is not None  # h5 overlap cache found
    s = ds.__getitem__(0)
    aligned = se3_np.se3_transform(s["pose"], s["src_xyz"])
    d, _ = cKDTree(s["tgt_xyz"]).query(aligned[s["src_overlap"]], k=1)
    assert np.median(d) < 0.02        # overlap points line up under GT
    assert 0.3 <= s["overlap_p"] <= 1.0


def test_test_split_and_perfect_est_recall(synth_root):
    from fgfusion_tpu.benchmark.benchmark_3dmatch_rr import (
        benchmark, write_est_log)
    with open(os.path.join(synth_root, "test_3DMatch_info.pkl"), "rb") as f:
        infos = pickle.load(f)
    assert len(infos["rot"]) > 0

    est_dir = os.path.join(synth_root, "est_perfect")
    for item in range(len(infos["rot"])):
        scene = infos["src"][item].split(os.path.sep)[1]
        src_idx = int(os.path.basename(infos["src"][item])
                      .split("_")[-1].replace(".pth", ""))
        tgt_idx = int(os.path.basename(infos["tgt"][item])
                      .split("_")[-1].replace(".pth", ""))
        pose44 = np.eye(4)
        pose44[:3, :3] = infos["rot"][item]
        pose44[:3, 3:] = infos["trans"][item]
        write_est_log(os.path.join(est_dir, scene, "est.log"),
                      [(tgt_idx, src_idx, -1)], pose44[None])
    report, recall = benchmark(est_dir,
                               os.path.join(synth_root, "benchmarks/3DMatch"))
    assert recall == 1.0, report


def test_wrong_est_fails_protocol(synth_root):
    from fgfusion_tpu.benchmark.benchmark_3dmatch_rr import (
        benchmark, write_est_log)
    with open(os.path.join(synth_root, "test_3DMatch_info.pkl"), "rb") as f:
        infos = pickle.load(f)
    est_dir = os.path.join(synth_root, "est_wrong")
    for item in range(len(infos["rot"])):
        scene = infos["src"][item].split(os.path.sep)[1]
        src_idx = int(os.path.basename(infos["src"][item])
                      .split("_")[-1].replace(".pth", ""))
        tgt_idx = int(os.path.basename(infos["tgt"][item])
                      .split("_")[-1].replace(".pth", ""))
        write_est_log(os.path.join(est_dir, scene, "est.log"),
                      [(tgt_idx, src_idx, -1)], np.eye(4)[None])  # identity
    report, recall = benchmark(est_dir,
                               os.path.join(synth_root, "benchmarks/3DMatch"))
    assert recall < 0.5, report
