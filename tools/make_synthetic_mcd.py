#!/usr/bin/env python3
"""Synthetic MCD-format outdoor LiDAR sequence.

No network egress: the real MCD (Multi-Campus Dataset) sequences cannot
be downloaded, so this builds a format-identical synthetic stand-in that
exercises the FULL MCD capability end to end — the exact interface the
shipped conversion tools consume:

    <root>/cloud_inBody_mergeFrame/frame_XXXX.pcd   (binary PCD, xyz)
    <root>/cloud_inBody_mergeFrame/frame_XXXX.txt   (3x4 world pose)

then `tools/mcd/pcd_to_samplepth.py` (PCD -> downsampled .pth, pose
sidecars carried along) and `tools/mcd/create_mcd_pkl.py` (pair pkls)
run unchanged, `conf/mcd_synth.yaml` trains, and
`tools/mcd/eval_mcd_rmse.py` produces the pose.log -> TUM -> APE-RMSE
number (reference flow: data_processing/MCD/* + evo/Readme.txt:1-6).

Scene: a procedural street block — ground plane, building boxes along
both sides, poles, tree trunks + canopies. Frames are spinning-scan
LiDAR sweeps (azimuth x elevation ray grid, analytic ray casting
against the primitives, range noise) taken along a smooth vehicle
trajectory; clouds are stored in the BODY frame with the world pose in
the sidecar, exactly like the real exporter.

World scale: 1 unit ~ 20 m (the street block spans ~6 units). The
miniaturization keeps the Predator-scale backbone hyperparameters
(first_subsampling_dl 0.025 etc., reference conf/mcd.yaml — which
reuses the indoor backbone for MCD unchanged) geometrically sensible:
typical returned-point spacing lands near the 2.5 cm voxel, as it does
for the indoor fragments the backbone was designed around.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# analytic ray casting (vectorized over rays per primitive)
# ---------------------------------------------------------------------------

def ray_plane_z(o, d, z0):
    """Horizontal plane z = z0. Returns t (inf where no hit)."""
    dz = d[:, 2]
    t = np.where(np.abs(dz) > 1e-9, (z0 - o[2]) / np.where(
        np.abs(dz) > 1e-9, dz, 1.0), np.inf)
    return np.where(t > 1e-6, t, np.inf)


def ray_aabb(o, d, lo, hi):
    """Axis-aligned box [lo, hi]. Slab method; returns entry t."""
    inv = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)
    t0 = (lo[None] - o[None]) * inv
    t1 = (hi[None] - o[None]) * inv
    tmin = np.minimum(t0, t1).max(axis=1)
    tmax = np.maximum(t0, t1).min(axis=1)
    hit = (tmax >= np.maximum(tmin, 1e-6))
    return np.where(hit, np.where(tmin > 1e-6, tmin, np.inf), np.inf)


def ray_vcyl(o, d, c, r, z0, z1):
    """Vertical cylinder centered (cx, cy), radius r, z in [z0, z1]."""
    ox, oy = o[0] - c[0], o[1] - c[1]
    dx, dy = d[:, 0], d[:, 1]
    a = dx * dx + dy * dy
    b = 2 * (ox * dx + oy * dy)
    cc = ox * ox + oy * oy - r * r
    disc = b * b - 4 * a * cc
    ok = (disc >= 0) & (a > 1e-12)
    sq = np.sqrt(np.where(ok, disc, 0.0))
    t = np.where(ok, (-b - sq) / np.where(a > 1e-12, 2 * a, 1.0), np.inf)
    z = o[2] + t * d[:, 2]
    return np.where(ok & (t > 1e-6) & (z >= z0) & (z <= z1), t, np.inf)


def ray_sphere(o, d, c, r):
    oc = o - c
    b = 2 * d @ oc
    cc = oc @ oc - r * r
    disc = b * b - 4 * cc  # |d| = 1
    ok = disc >= 0
    sq = np.sqrt(np.where(ok, disc, 0.0))
    t = (-b - sq) / 2.0
    return np.where(ok & (t > 1e-6), t, np.inf)


# ---------------------------------------------------------------------------
# scene + trajectory
# ---------------------------------------------------------------------------

def make_scene(rng, length=6.0, half_width=0.55):
    """Street block: primitives list of (kind, params)."""
    prims = [("ground", (0.0,))]
    # buildings along both sides
    x = 0.2
    while x < length - 0.3:
        for side in (-1.0, 1.0):
            w = rng.uniform(0.3, 0.7)          # along street
            dpt = rng.uniform(0.3, 0.8)        # depth away from street
            h = rng.uniform(0.3, 0.9)
            y0 = side * half_width + (0.0 if side > 0 else -dpt)
            lo = np.array([x, y0, 0.0])
            hi = np.array([x + w, y0 + dpt, h])
            if rng.random() < 0.85:
                prims.append(("box", (lo, hi)))
        x += rng.uniform(0.5, 0.9)
    # poles + trees on the sidewalk
    for _ in range(18):
        px = rng.uniform(0.0, length)
        side = 1.0 if rng.random() < 0.5 else -1.0
        py = side * rng.uniform(half_width * 0.55, half_width * 0.95)
        if rng.random() < 0.5:
            prims.append(("cyl", (np.array([px, py]), 0.012,
                                  0.0, rng.uniform(0.25, 0.45))))
        else:
            trunk_h = rng.uniform(0.15, 0.3)
            prims.append(("cyl", (np.array([px, py]), 0.02, 0.0, trunk_h)))
            prims.append(("sphere", (np.array([px, py, trunk_h + 0.08]),
                                     rng.uniform(0.08, 0.16))))
    # a few parked boxes (cars) on the street edge
    for _ in range(6):
        px = rng.uniform(0.2, length - 0.4)
        side = 1.0 if rng.random() < 0.5 else -1.0
        py = side * rng.uniform(half_width * 0.55, half_width * 0.8)
        lo = np.array([px, py - 0.05, 0.0])
        hi = np.array([px + 0.22, py + 0.05, 0.08])
        prims.append(("box", (lo, hi)))
    return prims


def cast_sweep(prims, origin, n_az=2048, n_el=48, el_range=(-25.0, 12.0),
               r_max=3.0, noise=0.003, rng=None):
    """One spinning LiDAR sweep from `origin` (world frame)."""
    az = np.linspace(0, 2 * np.pi, n_az, endpoint=False)
    el = np.radians(np.linspace(el_range[0], el_range[1], n_el))
    a, e = np.meshgrid(az, el, indexing="ij")
    d = np.stack([np.cos(e) * np.cos(a), np.cos(e) * np.sin(a),
                  np.sin(e)], axis=-1).reshape(-1, 3)

    t_best = np.full(d.shape[0], np.inf)
    for kind, p in prims:
        if kind == "ground":
            t = ray_plane_z(origin, d, p[0])
        elif kind == "box":
            t = ray_aabb(origin, d, p[0], p[1])
        elif kind == "cyl":
            t = ray_vcyl(origin, d, p[0], p[1], p[2], p[3])
        else:
            t = ray_sphere(origin, d, p[0], p[1])
        t_best = np.minimum(t_best, t)

    hit = np.isfinite(t_best) & (t_best < r_max)
    t_best = t_best[hit] + rng.normal(scale=noise, size=hit.sum())
    return origin[None] + t_best[:, None] * d[hit]


def trajectory(n_frames, length=6.0, rng=None):
    """Smooth vehicle path down the street; yaw follows the tangent."""
    s = np.linspace(0.35, length - 0.35, n_frames)
    y = 0.12 * np.sin(s * 1.7) + 0.05 * np.sin(s * 0.7 + 1.0)
    z = np.full_like(s, 0.085)                    # sensor height ~1.7 m
    pos = np.stack([s, y, z], axis=1)
    dy = np.gradient(y, s)
    yaw = np.arctan2(dy, 1.0)
    poses = []
    for k in range(n_frames):
        cz, sz = np.cos(yaw[k]), np.sin(yaw[k])
        R = np.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
        # small roll/pitch perturbation like a real vehicle
        rp = rng.normal(scale=0.01, size=2)
        cr, sr = np.cos(rp[0]), np.sin(rp[0])
        cp, sp = np.cos(rp[1]), np.sin(rp[1])
        Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
        Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
        poses.append((R @ Ry @ Rx, pos[k]))
    return poses


# ---------------------------------------------------------------------------
# MCD-format IO
# ---------------------------------------------------------------------------

def write_pcd(path, pts):
    """Binary PCD v0.7, fields x y z float32."""
    pts = np.ascontiguousarray(pts, np.float32)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
        "COUNT 1 1 1\n"
        f"WIDTH {len(pts)}\nHEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {len(pts)}\nDATA binary\n")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(pts.tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets/mcd_synth")
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--n_az", type=int, default=2048)
    ap.add_argument("--n_el", type=int, default=48)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    prims = make_scene(rng)
    poses = trajectory(args.frames, rng=rng)

    out_dir = os.path.join(args.root, "cloud_inBody_mergeFrame")
    os.makedirs(out_dir, exist_ok=True)
    for k, (R, t) in enumerate(poses):
        world_pts = cast_sweep(prims, t, n_az=args.n_az, n_el=args.n_el,
                               rng=rng)
        body = (world_pts - t) @ R               # R^T (x - t), row-vector form
        write_pcd(os.path.join(out_dir, f"frame_{k:04d}.pcd"),
                  body.astype(np.float32))
        with open(os.path.join(out_dir, f"frame_{k:04d}.txt"), "w") as f:
            for row in np.concatenate([R, t[:, None]], axis=1):
                f.write(" ".join(f"{v:.12f}" for v in row) + "\n")
        print(f"frame {k}: {len(body)} pts")
    print(f"wrote {args.frames} frames to {out_dir}")


if __name__ == "__main__":
    main()
