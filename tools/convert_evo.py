#!/usr/bin/env python3
"""Convert a predicted pose.log (sequence of 4x4 poses in Redwood-ish
format) into a TUM-style trajectory for `evo_ape` RMSE evaluation.

Reference: evo/convert_evo.py + evo/Readme.txt — output lines are
`idx tx ty tz qx qy qz qw` (quaternion in xyzw order, matching the
reference's mat2quat w-first source reordered to evo's xyzw).

Usage: python tools/convert_evo.py POSE_LOG OUT_FILE
"""
import sys

import numpy as np
from scipy.spatial.transform import Rotation


def convert(pose_log: str, out_file: str):
    with open(pose_log) as f:
        lines = [l for l in f.readlines() if l.strip()]
    n = len(lines) // 5
    with open(out_file, "w") as out:
        for i in range(n):
            rows = [np.fromstring(lines[i * 5 + 1 + r].replace("\t", " "),
                                  sep=" ") for r in range(3)]
            mat = np.stack(rows)
            rot, t = mat[:, :3], mat[:, 3]
            q = Rotation.from_matrix(rot).as_quat()  # (x, y, z, w)
            out.write(f"{i} {t[0]} {t[1]} {t[2]} "
                      f"{q[0]} {q[1]} {q[2]} {q[3]}\n")
    print(f"wrote {n} poses to {out_file}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    convert(sys.argv[1], sys.argv[2])
