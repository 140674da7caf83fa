"""InferenceEngine: checkpoint -> register() round trip on the tiny
config, with a trained-enough model at least producing valid rigid
poses and unpadded info arrays."""
import numpy as np
import jax

from fgfusion_tpu.geometry import se3_np
from fgfusion_tpu.models import get_model
from fgfusion_tpu.ops import PyramidSpec
from fgfusion_tpu.train.checkpoint import CheckpointManager
from fgfusion_tpu.train.trainer import create_train_state

from test_model import TINY_CFG, SPEC, make_batch


def test_inference_engine_register(tmp_path, rng):
    import yaml
    # build + save an untrained checkpoint
    cfg = dict(TINY_CFG)
    cfg.update(optimizer="AdamW", base_lr=1e-4, weight_decay=0.0,
               grad_clip=0.1, scheduler="none",
               model="finegrained_regtr.RegTR",
               pyramid_capacities=list(SPEC.capacities))
    model = get_model("finegrained_regtr.RegTR")(cfg=cfg)
    batch = make_batch(rng)
    state, _ = create_train_state(model, cfg, SPEC, batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, jax.device_get(state), score=1.0)
    mgr.wait()

    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump({"model_section": dict(cfg)}))

    from fgfusion_tpu.inference import InferenceEngine
    engine = InferenceEngine.from_checkpoint(str(tmp_path / "ckpt"),
                                             str(cfg_path))

    src = rng.normal(size=(100, 3)).astype(np.float32) * 0.3
    pose_gt = se3_np.sample_pose_small(rng, std=0.2)
    tgt = se3_np.se3_transform(pose_gt, src)
    pose, info = engine.register(src, tgt)

    assert pose.shape == (3, 4)
    # rigid: orthonormal rotation
    RtR = pose[:3, :3] @ pose[:3, :3].T
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-3)
    assert info["src_kp"].shape[0] == info["src_overlap"].shape[0]
    assert info["src_kp"].shape[0] <= SPEC.capacities[-1]
    assert np.all((info["src_overlap"] >= 0) & (info["src_overlap"] <= 1))
    assert info["pose_all_layers"].shape == (TINY_CFG["num_encoder_layers"], 3, 4)


def test_inference_ransac_refinement(tmp_path, rng):
    """refine='ransac' path produces a valid rigid pose + inlier info."""
    import yaml
    cfg = dict(TINY_CFG)
    cfg.update(optimizer="AdamW", base_lr=1e-4, weight_decay=0.0,
               grad_clip=0.1, scheduler="none",
               model="finegrained_regtr.RegTR",
               pyramid_capacities=list(SPEC.capacities))
    model = get_model("finegrained_regtr.RegTR")(cfg=cfg)
    batch = make_batch(rng)
    state, _ = create_train_state(model, cfg, SPEC, batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, jax.device_get(state), score=1.0)
    mgr.wait()
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump({"m": dict(cfg)}))

    from fgfusion_tpu.inference import InferenceEngine
    engine = InferenceEngine.from_checkpoint(str(tmp_path / "ckpt"),
                                             str(cfg_path))
    src = rng.normal(size=(100, 3)).astype(np.float32) * 0.3
    pose_gt = se3_np.sample_pose_small(rng, std=0.2)
    tgt = se3_np.se3_transform(pose_gt, src)
    pose, info = engine.register(src, tgt, refine="ransac")
    RtR = pose[:3, :3] @ pose[:3, :3].T
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-3)
    assert "ransac_inliers" in info and "ransac_score" in info

    # refine='ransac_select': the returned pose must be one of the two
    # candidates (learned or ransac), picked by weighted inlier score
    pose_plain, _ = engine.register(src, tgt)
    pose_sel, info_sel = engine.register(src, tgt, refine="ransac_select")
    assert "select_scores" in info_sel
    s = info_sel["select_scores"]
    want = pose if s["ransac"] > s["learned"] else pose_plain
    np.testing.assert_allclose(pose_sel, want, atol=1e-6)
