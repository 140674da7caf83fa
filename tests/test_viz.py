"""Visualization smoke tests (headless matplotlib + PCA coloring)."""
import os

import numpy as np

from fgfusion_tpu.geometry import se3_np
from fgfusion_tpu.utils.viz import visualize_registration


def test_visualize_registration_writes_png(tmp_path, rng):
    src = rng.normal(size=(200, 3)).astype(np.float32)
    pose = se3_np.sample_pose_small(rng, std=0.3)
    tgt = se3_np.se3_transform(pose, src)
    out = visualize_registration(
        src, tgt, pose_pred=pose, pose_gt=pose,
        correspondence_conf=rng.random(200).astype(np.float32), kp=src,
        out_path=str(tmp_path / "reg.png"))
    assert os.path.exists(out)
    assert os.path.getsize(out) > 10_000  # a real rendered figure


def test_pca_color_pair_shared_basis(rng):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "save_colorP3D", os.path.join(os.path.dirname(__file__), "..",
                                      "save_colorP3D.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # two clouds with identical features must get identical colors
    feats = rng.normal(size=(50, 16)).astype(np.float32)
    src_rgb, tgt_rgb = mod.pca_color_pair(feats, feats.copy())
    np.testing.assert_allclose(src_rgb, tgt_rgb, atol=1e-5)
    assert src_rgb.shape == (50, 3)
    assert src_rgb.min() >= 0.0 and src_rgb.max() <= 1.0
