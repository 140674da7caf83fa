"""Serving API: load a checkpoint once, register point-cloud pairs.

The reference has no serving layer (inference = save_result_demo.py's
ad-hoc loop); this provides the production entry point:

    engine = InferenceEngine.from_checkpoint("logs/run/ckpt",
                                             "conf/3dmatch.yaml")
    pose, info = engine.register(src_xyz, tgt_xyz)   # numpy in/out

- one XLA program per (bucket, batch) shape, compiled lazily and cached
  (plus the persistent on-disk compile cache);
- clouds are padded (or subsampled) to the configured bucket;
- returns the final-layer pose plus per-point overlap scores and the
  coarse keypoints/correspondences for downstream use (e.g. RANSAC
  refinement via models.ransac).
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from .data.buckets import collate_pairs
from .models import get_model
from .ops import PyramidSpec
from .utils.config import load_config


class InferenceEngine:
    def __init__(self, model, variables, spec: PyramidSpec, cfg):
        self.model = model
        self.variables = variables
        self.spec = spec
        self.cfg = cfg
        # bucket ladder (cfg eval_buckets): pairs pad to the smallest
        # bucket that fits, one lazily-compiled program per bucket —
        # same policy as Trainer.test
        self.buckets = sorted(int(b) for b in
                              cfg.get("eval_buckets", [spec.capacities[0]]))
        self._fwd = {}
        self.n_subsampled = 0  # pairs that exceeded the largest bucket

    def _fwd_for(self, n_points: int):
        from .ops.pyramid import scale_spec
        b = next((bb for bb in self.buckets if bb >= n_points),
                 self.buckets[-1])
        if b not in self._fwd:
            spec_b = scale_spec(
                self.spec, b,
                float(self.cfg.get("eval_capacity_headroom", 1.0)))
            self._fwd[b] = jax.jit(partial(self._forward, spec=spec_b))
        return b, self._fwd[b]

    def _forward(self, variables, batch, spec):
        return self.model.apply(variables, batch, spec, train=False)

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, config_path: str,
                        capacities=None) -> "InferenceEngine":
        from .train.checkpoint import CheckpointManager
        from .train.trainer import create_train_state

        cfg = load_config(config_path)
        caps = capacities or cfg.get("pyramid_capacities")
        if caps is None:
            from .data.buckets import capacity_schedule
            caps = capacity_schedule(int(cfg.get("point_capacity", 16384)),
                                     cfg["num_layers"])
        spec = PyramidSpec.from_config(cfg, caps)
        model = get_model(cfg["model"])(cfg=dict(cfg))

        dummy = {
            "src_xyz": np.zeros((1, caps[0], 3), np.float32),
            "tgt_xyz": np.zeros((1, caps[0], 3), np.float32),
            "src_mask": np.zeros((1, caps[0]), bool),
            "tgt_mask": np.zeros((1, caps[0]), bool),
            "src_overlap": np.zeros((1, caps[0]), np.float32),
            "tgt_overlap": np.zeros((1, caps[0]), np.float32),
            "pose": np.eye(4, dtype=np.float32)[None, :3],
        }
        state, _ = create_train_state(model, cfg, spec, dummy, abstract=True)
        if ckpt_dir.endswith(".npz"):
            from .train.snapshot import load_params_npz
            state, _ = load_params_npz(ckpt_dir, state)
        else:
            state, _ = CheckpointManager(ckpt_dir).load(state, best=True)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return cls(model, variables, spec, cfg)

    # ------------------------------------------------------------------
    def register(self, src_xyz: np.ndarray, tgt_xyz: np.ndarray,
                 rng: Optional[np.random.Generator] = None,
                 refine: Optional[str] = None, seed: int = 0
                 ) -> Tuple[np.ndarray, Dict]:
        """Register one pair. Returns (pose (3,4) mapping src->tgt, info).

        info: overlap scores + coarse keypoints/warped correspondences
        (final transformer layer), each already unpadded.

        refine='ransac' additionally runs the batched on-device RANSAC
        (models.ransac) over the predicted correspondences, sampling
        proportionally to the overlap confidences — the TPU-native
        analogue of the reference's vendored nabla-RANSAC refinement
        (BASELINE.json: "RANSAC-refined inference").
        """
        sample = {"src_xyz": np.asarray(src_xyz, np.float32),
                  "tgt_xyz": np.asarray(tgt_xyz, np.float32),
                  "pose": np.eye(4, dtype=np.float32)[:3]}
        n_need = max(len(sample["src_xyz"]), len(sample["tgt_xyz"]))
        if n_need > self.buckets[-1]:
            # mirror Trainer.test's n_subsampled accounting: falling
            # back to the largest bucket subsamples the pair
            self.n_subsampled += 1
            logging.getLogger(__name__).warning(
                "pair exceeds largest eval bucket (%d > %d); subsampling "
                "— add a larger bucket to eval_buckets for full fidelity",
                n_need, self.buckets[-1])
        bucket, fwd = self._fwd_for(n_need)
        batch = collate_pairs([sample], bucket, rng)
        pred = fwd(self.variables, batch)

        pose = np.asarray(pred["pose"])[-1, 0]
        sm = np.asarray(pred["src_mask_c"])[0]
        tm = np.asarray(pred["tgt_mask_c"])[0]
        info = {
            "src_kp": np.asarray(pred["src_kp"])[0][sm],
            "tgt_kp": np.asarray(pred["tgt_kp"])[0][tm],
            "src_kp_warped": np.asarray(pred["src_kp_warped"])[-1, 0][sm],
            "tgt_kp_warped": np.asarray(pred["tgt_kp_warped"])[-1, 0][tm],
            "src_overlap": _sigmoid(np.asarray(pred["src_overlap"])[-1, 0, :, 0][sm]),
            "tgt_overlap": _sigmoid(np.asarray(pred["tgt_overlap"])[-1, 0, :, 0][tm]),
            "pose_all_layers": np.asarray(pred["pose"])[:, 0],
        }

        if refine in ("ransac", "ransac_select"):
            import jax
            from .models.ransac import ransac_rigid, weighted_inlier_score
            corr_src = np.concatenate([info["src_kp"], info["tgt_kp_warped"]])
            corr_tgt = np.concatenate([info["src_kp_warped"], info["tgt_kp"]])
            weights = np.concatenate([info["src_overlap"], info["tgt_overlap"]])
            thr = float(self.cfg.get("overlap_radius", 0.0375)) * 2
            refined, inliers, score = ransac_rigid(
                np.asarray(corr_src, np.float32),
                np.asarray(corr_tgt, np.float32),
                jax.random.PRNGKey(seed),
                weights=np.asarray(weights, np.float32),
                num_hypotheses=256,
                inlier_threshold=thr)
            info["ransac_inliers"] = np.asarray(inliers)
            info["ransac_score"] = float(score)
            if refine == "ransac_select":
                # keep whichever pose has the higher weighted inlier
                # count (learned pose wins on high-inlier pairs)
                cs = np.asarray(corr_src, np.float32)
                ct = np.asarray(corr_tgt, np.float32)
                wf = np.asarray(weights, np.float32)
                s_r = float(weighted_inlier_score(refined, cs, ct, wf,
                                                  threshold=thr))
                s_l = float(weighted_inlier_score(pose, cs, ct, wf,
                                                  threshold=thr))
                info["select_scores"] = {"learned": s_l, "ransac": s_r}
                if s_r > s_l:
                    pose = np.asarray(refined)
            else:
                pose = np.asarray(refined)
        return pose, info


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))
