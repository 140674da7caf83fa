"""KPConv kernel-point dispositions.

Fresh implementation of the repulsion-based kernel disposition
optimizer described in the KPConv paper (Thomas et al., ICCV 2019;
reference behaviour: models/backbone_kpconv/kernels/kernel_points.py):

- points repel each other with an inverse-square potential and are
  pulled toward the origin by a quadratic potential;
- with fixed='center' the first point is pinned at the origin;
- the result is rescaled so the mean non-center radius equals `ratio`
  (0.66), then multiplied by the conv radius;
- at model init a random rotation and N(0, 0.01) jitter are applied
  (reference: kernel_points.py:433-469 applies these on *every* load;
  we apply them once per seed for determinism).

Dispositions are cached on disk per (K, fixed) so the optimization runs
once per configuration.
"""
from __future__ import annotations

import os

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "_kernel_cache")


def optimize_kernel_points(num_points: int, fixed: str = "center",
                           ratio: float = 0.66, seed: int = 0,
                           n_iters: int = 10000) -> np.ndarray:
    """Optimize a unit-radius kernel disposition, (K, 3) float32."""
    rng = np.random.default_rng(seed)

    # Rejection-sample initial points inside radius sqrt(0.5).
    pts = np.empty((0, 3))
    while pts.shape[0] < num_points:
        cand = rng.uniform(-1.0, 1.0, size=(4 * num_points, 3))
        cand = cand[np.sum(cand ** 2, axis=1) < 0.5]
        pts = np.vstack([pts, cand])
    pts = pts[:num_points].copy()
    if fixed == "center":
        pts[0] = 0.0

    step = 1e-2
    decay = 0.9995
    clip = 0.05
    prev_norms = np.zeros(num_points)
    for _ in range(n_iters):
        diff = pts[:, None, :] - pts[None, :, :]           # (K, K, 3)
        d2 = np.sum(diff ** 2, axis=-1)
        rep = np.sum(diff / (d2[..., None] ** 1.5 + 1e-6), axis=1)
        grad = rep + 10.0 * pts                            # attraction
        norms = np.linalg.norm(grad, axis=-1)
        moving = np.minimum(step * norms, clip)
        if fixed == "center":
            moving[0] = 0.0
            if np.max(np.abs(prev_norms[1:] - norms[1:])) < 1e-5:
                break
        elif np.max(np.abs(prev_norms - norms)) < 1e-5:
            break
        prev_norms = norms
        pts -= moving[:, None] * grad / (norms[:, None] + 1e-6)
        step *= decay

    r = np.linalg.norm(pts, axis=-1)
    denom = np.mean(r[1:]) if fixed == "center" else np.mean(r)
    pts *= ratio / denom
    return pts.astype(np.float32)


def spherical_lloyd(num_cells: int, fixed: str = "center", seed: int = 0,
                    approx_n: int = 5000, max_iter: int = 500,
                    momentum: float = 0.9) -> np.ndarray:
    """Monte-Carlo Lloyd relaxation of num_cells sites in the unit ball.

    Used for dispositions with K > 30 where the pairwise repulsion
    optimizer converges poorly (reference load_kernels dispatch,
    kernel_points.py:395-396; algorithm kernel_points.py:235-330):
    each iteration samples points uniformly in the ball, assigns them
    to the nearest site (Voronoi), and moves every non-fixed site
    toward its cell centroid with momentum. Unlike the repulsion
    disposition there is NO 0.66 rescale — Lloyd cells tile the whole
    ball (reference scales by radius directly).
    """
    rng = np.random.default_rng(seed)

    # init: uniform in the outer shell (reference draws in the 0.9-1.0
    # radius shell so initial sites spread over the boundary)
    sites = np.empty((0, 3))
    while sites.shape[0] < num_cells:
        cand = rng.uniform(-1.0, 1.0, size=(4 * num_cells, 3))
        d2 = np.sum(cand ** 2, axis=1)
        sites = np.vstack([sites, cand[(d2 < 1.0) & (d2 > 0.81)]])
    sites = sites[:num_cells].copy()
    n_fixed = 0
    if fixed == "center":
        sites[0] = 0.0
        n_fixed = 1
    elif fixed == "verticals":
        sites[:3] = 0.0
        sites[1, 2] = 2.0 / 3.0
        sites[2, 2] = -2.0 / 3.0
        n_fixed = 3

    for _ in range(max_iter):
        x = rng.uniform(-1.0, 1.0, size=(2 * approx_n, 3))
        x = x[np.sum(x ** 2, axis=1) < 1.0][:approx_n]
        # nearest site per sample
        d2 = np.sum((x[:, None, :] - sites[None]) ** 2, axis=-1)
        owner = np.argmin(d2, axis=1)
        for c in range(n_fixed, num_cells):
            cell = x[owner == c]
            if len(cell):
                sites[c] = momentum * sites[c] + (1 - momentum) * cell.mean(0)
    return sites.astype(np.float32)


def _cached_disposition(num_points: int, fixed: str) -> np.ndarray:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    # The cache key is versioned with the generating algorithm so a
    # stale file from a different optimizer can never silently shadow
    # the dispatch rule (K>30 -> Lloyd, reference kernel_points.py:395).
    algo = "lloyd" if num_points > 30 else "repulse"
    path = os.path.join(_CACHE_DIR, f"k_{num_points:03d}_{fixed}_{algo}_3d.npy")
    if os.path.exists(path):
        return np.load(path)
    if num_points > 30:
        pts = spherical_lloyd(num_points, fixed=fixed)
    else:
        pts = optimize_kernel_points(num_points, fixed=fixed)
    np.save(path, pts)
    return pts


def load_kernel_points(radius: float, num_points: int, fixed: str = "center",
                       seed: int = 0, jitter: float = 0.01) -> np.ndarray:
    """Disposition scaled to `radius`, randomly rotated + jittered.

    Matches reference load_kernels (kernel_points.py:387-469) except the
    randomness is seeded (deterministic builds) rather than drawn from
    global numpy state at every construction.
    """
    pts = _cached_disposition(num_points, fixed).copy()
    rng = np.random.default_rng(seed)
    theta = rng.random() * 2 * np.pi
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)
    pts = pts + rng.normal(scale=jitter, size=pts.shape)
    pts = radius * pts
    return (pts @ rot).astype(np.float32)
