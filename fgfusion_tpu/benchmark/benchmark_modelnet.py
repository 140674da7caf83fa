"""ModelNet registration metrics (RPMNet protocol), pure numpy.

Reference: benchmark/benchmark_modelnet.py. Metrics per pair:
- euler-angle r_mse / r_mae in the DCP convention (xyz euler of the
  rotation matrices, degrees) and per-axis t_mse / t_mae
- isotropic err_r_deg (trace formula) and err_t (translation of
  gt^-1 ∘ pred)
- modified Chamfer distance: src warped by the prediction vs the clean
  raw cloud, and ref vs the raw cloud warped by pred ∘ gt^-1.
`summarize_metrics` turns *mse into rmse and adds mean/rmse for err_*.
"""
from __future__ import annotations

from typing import Dict

import numpy as np
from scipy.spatial.transform import Rotation

from ..geometry import se3_np


def dcm2euler(mats: np.ndarray, seq: str = "xyz", degrees: bool = True) -> np.ndarray:
    return Rotation.from_matrix(mats).as_euler(seq, degrees=degrees)


def _square_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.sum((a[:, :, None, :] - b[:, None, :, :]) ** 2, axis=-1)


def compute_metrics(gt_transforms: np.ndarray, pred_transforms: np.ndarray,
                    points_src: np.ndarray, points_ref: np.ndarray,
                    points_raw: np.ndarray,
                    src_mask: np.ndarray = None,
                    ref_mask: np.ndarray = None) -> Dict[str, np.ndarray]:
    """All inputs batched: transforms (B, 3, 4), clouds (B, N, 3).
    Masks (optional) exclude padding from the Chamfer means."""
    r_gt = dcm2euler(gt_transforms[:, :3, :3], seq="xyz")
    r_pred = dcm2euler(pred_transforms[:, :3, :3], seq="xyz")
    t_gt = gt_transforms[:, :3, 3]
    t_pred = pred_transforms[:, :3, 3]
    r_mse = np.mean((r_gt - r_pred) ** 2, axis=1)
    r_mae = np.mean(np.abs(r_gt - r_pred), axis=1)
    t_mse = np.mean((t_gt - t_pred) ** 2, axis=1)
    t_mae = np.mean(np.abs(t_gt - t_pred), axis=1)

    concatenated = se3_np.se3_cat(se3_np.se3_inv(gt_transforms), pred_transforms)
    rot_trace = (concatenated[:, 0, 0] + concatenated[:, 1, 1]
                 + concatenated[:, 2, 2])
    residual_rotdeg = np.degrees(
        np.arccos(np.clip(0.5 * (rot_trace - 1), -1.0, 1.0)))
    residual_transmag = np.linalg.norm(concatenated[:, :, 3], axis=-1)

    src_transformed = se3_np.se3_transform(pred_transforms, points_src)
    src_clean = se3_np.se3_transform(
        se3_np.se3_cat(pred_transforms, se3_np.se3_inv(gt_transforms)), points_raw)
    dist_src = np.min(_square_distance(src_transformed, points_raw), axis=-1)
    dist_ref = np.min(_square_distance(points_ref, src_clean), axis=-1)
    if src_mask is not None:
        dist_src = np.where(src_mask, dist_src, 0.0)
        dist_ref = np.where(ref_mask, dist_ref, 0.0)
        chamfer = (dist_src.sum(1) / np.maximum(src_mask.sum(1), 1)
                   + dist_ref.sum(1) / np.maximum(ref_mask.sum(1), 1))
    else:
        chamfer = np.mean(dist_src, axis=1) + np.mean(dist_ref, axis=1)

    return {
        "r_mse": r_mse, "r_mae": r_mae,
        "t_mse": t_mse, "t_mae": t_mae,
        "err_r_deg": residual_rotdeg, "err_t": residual_transmag,
        "chamfer_dist": chamfer,
    }


def summarize_metrics(metrics: Dict[str, np.ndarray]) -> Dict[str, float]:
    out = {}
    for k, v in metrics.items():
        v = np.concatenate([np.atleast_1d(x) for x in np.atleast_1d(v)]) \
            if isinstance(v, list) else np.asarray(v)
        if k.endswith("mse"):
            out[k[:-3] + "rmse"] = float(np.sqrt(np.mean(v)))
        elif k.startswith("err"):
            out[k + "_mean"] = float(np.mean(v))
            out[k + "_rmse"] = float(np.sqrt(np.mean(v ** 2)))
        else:
            out[k] = float(np.mean(v))
    return out


def print_metrics(logger, summary: Dict[str, float], title: str = "Metrics"):
    logger.info("%s:", title)
    logger.info("=" * (len(title) + 1))
    logger.info(
        "DeepCP metrics: %.4f(rot-rmse) | %.4f(rot-mae) | %.4g(trans-rmse) | "
        "%.4g(trans-mae)", summary["r_rmse"], summary["r_mae"],
        summary["t_rmse"], summary["t_mae"])
    logger.info("Rotation error %.4f(deg, mean) | %.4f(deg, rmse)",
                summary["err_r_deg_mean"], summary["err_r_deg_rmse"])
    logger.info("Translation error %.4g(mean) | %.4g(rmse)",
                summary["err_t_mean"], summary["err_t_rmse"])
    logger.info("Chamfer error: %.7f(mean-sq)", summary["chamfer_dist"])
