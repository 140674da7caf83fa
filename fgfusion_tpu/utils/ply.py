"""Minimal binary-PLY writer/reader for point clouds with optional
colors (reference ships a full PLY codec at
models/backbone_kpconv/utils/ply.py for kernel caching + viz; here we
need only xyz[+rgb] round-trips)."""
from __future__ import annotations

from typing import Optional

import numpy as np


def write_ply(path: str, xyz: np.ndarray, rgb: Optional[np.ndarray] = None):
    n = xyz.shape[0]
    props = ["property float x", "property float y", "property float z"]
    if rgb is not None:
        props += ["property uchar red", "property uchar green",
                  "property uchar blue"]
    header = "\n".join([
        "ply", "format binary_little_endian 1.0",
        f"element vertex {n}", *props, "end_header", ""])
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if rgb is None:
            f.write(xyz.astype("<f4").tobytes())
        else:
            rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                     ("r", "u1"), ("g", "u1"), ("b", "u1")])
            rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
            rgb8 = np.clip(rgb * 255 if rgb.dtype.kind == "f" else rgb,
                           0, 255).astype(np.uint8)
            rec["r"], rec["g"], rec["b"] = rgb8[:, 0], rgb8[:, 1], rgb8[:, 2]
            f.write(rec.tobytes())


def read_ply_xyz(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode("ascii").splitlines()
        n = next(int(l.split()[-1]) for l in lines if l.startswith("element vertex"))
        props = [l.split()[-1] for l in lines if l.startswith("property")]
        assert props[:3] == ["x", "y", "z"]
        has_rgb = len(props) > 3
        if has_rgb:
            rec = np.frombuffer(f.read(), dtype=[("x", "<f4"), ("y", "<f4"),
                                                 ("z", "<f4"), ("r", "u1"),
                                                 ("g", "u1"), ("b", "u1")],
                                count=n)
        else:
            rec = np.frombuffer(f.read(), dtype=[("x", "<f4"), ("y", "<f4"),
                                                 ("z", "<f4")], count=n)
    return np.stack([rec["x"], rec["y"], rec["z"]], axis=1)
