#!/usr/bin/env python
"""Per-scene RR failure autopsy (VERDICT round-4 item 6 follow-up).

Given the per-scene eval artifacts the round-4 endgame ships
(results/evals/<tag>_scenes/<scene>/{est.log,flag.npy}) and the
benchmark's overlap info pkl, recompute:

  - global per-overlap-bin success rates over the valid gt pairs,
  - per-scene recall and, under the global rates, the probability
    that the scene scores exactly zero (the order-statistic check
    used for the round-3e MIT Lab / scene_2007 autopsy, STATUS.md).

A scene whose P(zero) is small (<~0.02) while its observed RR is 0 is
a genuine anomaly worth a geometry dig; a large P(zero) means the
zero is the expected tail of the model's global per-bin weakness.

Usage:
  python tools/scene_autopsy.py \
      --scenes_dir results/evals/r4_3DMatch_scenes \
      --info datasets/3dmatch_synthx3/test_3DMatch_info.pkl
"""
import argparse
import os
import pickle
import re

import numpy as np

BINS = [0.10, 0.20, 0.30, 0.40, 0.60, 1.01]


def load_overlaps(info_path):
    """(scene, i, j) -> gt overlap, from the benchmark info pkl."""
    with open(info_path, "rb") as f:
        info = pickle.load(f)
    table = {}
    pat = re.compile(r"(scene_\d+)/cloud_bin_(\d+)")
    for src, tgt, ov in zip(info["src"], info["tgt"], info["overlap"]):
        ms, mt = pat.search(src), pat.search(tgt)
        if not (ms and mt) or ms.group(1) != mt.group(1):
            continue
        scene = ms.group(1)
        a, b = int(ms.group(2)), int(mt.group(2))
        table[(scene, a, b)] = float(ov)
        table[(scene, b, a)] = float(ov)
    return table


def read_est_pairs(path):
    """est.log -> int pair ids, in flag.npy order (header every 5 lines:
    id0 id1 n_fragments, then a 4x4 pose)."""
    pairs = []
    with open(path) as f:
        lines = [ln.split() for ln in f if ln.strip()]
    for k in range(0, len(lines), 5):
        pairs.append((int(float(lines[k][0])), int(float(lines[k][1]))))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes_dir", required=True)
    ap.add_argument("--info", required=True)
    args = ap.parse_args()

    overlaps = load_overlaps(args.info)
    scenes = sorted(
        d for d in os.listdir(args.scenes_dir)
        if os.path.isfile(os.path.join(args.scenes_dir, d, "flag.npy")))
    if not scenes:
        raise SystemExit(f"no per-scene artifacts under {args.scenes_dir}")

    # collect valid pairs: (scene, overlap, success)
    rows = []
    for scene in scenes:
        flags = np.load(os.path.join(args.scenes_dir, scene, "flag.npy"))
        pairs = read_est_pairs(os.path.join(args.scenes_dir, scene, "est.log"))
        if len(pairs) != len(flags):
            print(f"WARN {scene}: {len(pairs)} est pairs vs {len(flags)} flags")
        for (a, b), fl in zip(pairs, flags):
            if fl == 2:  # not in the valid (non-consecutive) gt set
                continue
            ov = overlaps.get((scene, a, b))
            rows.append((scene, ov, int(fl == 0)))

    # global per-bin success rates
    rates = {}
    print("global per-overlap-bin success (valid pairs):")
    for lo, hi in zip(BINS[:-1], BINS[1:]):
        sel = [s for sc, ov, s in rows if ov is not None and lo <= ov < hi]
        rates[(lo, hi)] = (np.mean(sel) if sel else np.nan, len(sel))
        if sel:
            print(f"  [{lo:.2f},{hi:.2f}): {np.mean(sel):.3f}  (n={len(sel)})")

    def bin_rate(ov):
        for (lo, hi), (r, n) in rates.items():
            if ov is not None and lo <= ov < hi and n > 0:
                return r
        return np.nanmean([s for _, ov2, s in rows if ov2 is not None])

    print("\nscene      RR     n    P(RR=0 | global rates)  median_ov")
    for scene in scenes:
        sc_rows = [(ov, s) for sc, ov, s in rows if sc == scene]
        if not sc_rows:
            continue
        rr = np.mean([s for _, s in sc_rows])
        p0 = float(np.prod([1.0 - bin_rate(ov) for ov, _ in sc_rows]))
        med = np.median([ov for ov, _ in sc_rows if ov is not None])
        mark = "  <-- anomaly candidate" if rr == 0 and p0 < 0.02 else ""
        print(f"{scene}  {rr:.3f}  {len(sc_rows):3d}   {p0:.4f}"
              f"                 {med:.3f}{mark}")


if __name__ == "__main__":
    main()
