"""Registration visualization (matplotlib; the reference uses a VTK
viewer — cvhelpers/visualization + utils/viz.py:11 — which isn't
available headless here). Produces the same six views: source, target,
overlay before/after with predicted and GT poses, correspondence
confidence coloring; saved to PNG instead of an interactive window.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..geometry import se3_np

# a small named palette (reference cvhelpers/colors.py)
COLORS = {
    "red": (0.894, 0.102, 0.110),
    "blue": (0.216, 0.494, 0.722),
    "green": (0.302, 0.686, 0.290),
    "orange": (1.000, 0.498, 0.000),
    "purple": (0.596, 0.306, 0.639),
    "gray": (0.6, 0.6, 0.6),
}


def _scatter(ax, xyz, color, size=0.5, label=None):
    ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], s=size, c=[color], label=label)
    ax.set_axis_off()


def visualize_registration(src_xyz: np.ndarray, tgt_xyz: np.ndarray,
                           pose_pred: Optional[np.ndarray] = None,
                           pose_gt: Optional[np.ndarray] = None,
                           correspondence_conf: Optional[np.ndarray] = None,
                           kp: Optional[np.ndarray] = None,
                           out_path: str = "registration.png"):
    """Six-panel debug figure (reference utils/viz.py:11-132)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(15, 10))
    panels = []
    for i in range(6):
        panels.append(fig.add_subplot(2, 3, i + 1, projection="3d"))

    _scatter(panels[0], src_xyz, COLORS["red"], label="src")
    panels[0].set_title("source")
    _scatter(panels[1], tgt_xyz, COLORS["blue"], label="tgt")
    panels[1].set_title("target")

    _scatter(panels[2], src_xyz, COLORS["red"])
    _scatter(panels[2], tgt_xyz, COLORS["blue"])
    panels[2].set_title("before registration")

    if pose_pred is not None:
        warped = se3_np.se3_transform(np.asarray(pose_pred), src_xyz)
        _scatter(panels[3], warped, COLORS["red"])
        _scatter(panels[3], tgt_xyz, COLORS["blue"])
        panels[3].set_title("predicted alignment")
    if pose_gt is not None:
        warped = se3_np.se3_transform(np.asarray(pose_gt), src_xyz)
        _scatter(panels[4], warped, COLORS["red"])
        _scatter(panels[4], tgt_xyz, COLORS["blue"])
        panels[4].set_title("ground-truth alignment")
    if correspondence_conf is not None and kp is not None:
        sc = panels[5].scatter(kp[:, 0], kp[:, 1], kp[:, 2], s=1.5,
                               c=np.asarray(correspondence_conf),
                               cmap="viridis")
        fig.colorbar(sc, ax=panels[5], shrink=0.6)
        panels[5].set_axis_off()
        panels[5].set_title("overlap confidence")

    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
