#!/usr/bin/env python3
"""Probe the axon TPU tunnel until it answers, then exit 0.

Failure mode (recurred twice): after a TPU-holding process dies
(deadlock kill, SIGKILL mid-init), the remote relay keeps accepting
TCP but never replies — every new JAX process blocks forever in
backend init. Recovery is to wait until the remote side releases the
session; this probe polls `jax.devices()` in a SUBPROCESS with a hard
timeout (the hang is unkillable from inside a thread) and prints
"TPU OK" when the tunnel answers.

Usage: python tools/tpu_probe.py [--hours 2] ; chain scripts gate on
the "TPU OK" line (see tools/round3_chain9.sh, tools/round3b_*.sh).
"""
import argparse
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=2.0)
    ap.add_argument("--interval", type=float, default=45.0)
    args = ap.parse_args()
    deadline = time.time() + args.hours * 3600
    n = 0
    while time.time() < deadline:
        n += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; print(jax.devices())"],
                capture_output=True, text=True, timeout=180)
            out = (r.stdout or "") + (r.stderr or "")
            if "TPU" in out and r.returncode == 0:
                print("TPU OK", flush=True)
                return 0
            print(f"probe {n}: rc={r.returncode} {out.strip()[-120:]}",
                  flush=True)
        except subprocess.TimeoutExpired:
            print(f"probe {n}: timeout (tunnel unresponsive)", flush=True)
        time.sleep(args.interval)
    print("probe loop exhausted", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
