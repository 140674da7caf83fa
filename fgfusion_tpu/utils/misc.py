"""Metrics accumulation, logging and run-dir plumbing.

Reference parity: utils/misc.py (StatsMeter/AverageMeter,
metrics_to_string) and cvhelpers/misc.py (prepare_logger — timestamped
log dirs, --dev wipes ../logdev, stream + log.txt + debug_logs.txt
sinks, argv/git provenance).
"""
from __future__ import annotations

import logging
import os
import shutil
import subprocess
import sys
import time
from collections import defaultdict
from typing import Dict


def enable_persistent_compile_cache(repo_dir: str | None = None):
    """Point JAX at the repo's persistent compilation cache. On this
    TPU, XLA compiles go through a remote relay (minutes per program) —
    every entry point that touches the device must call this first."""
    import jax
    if repo_dir is None:
        repo_dir = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    cache = os.path.join(repo_dir, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class StatsMeter:
    """Dict of AverageMeters keyed on first use
    (reference utils/misc.py:40-97)."""

    def __init__(self):
        self.meters: Dict[str, AverageMeter] = defaultdict(AverageMeter)

    def update(self, key, value, n: int = 1):
        self.meters[key].update(value, n)

    def update_dict(self, d: Dict, n: int = 1):
        for k, v in d.items():
            self.update(k, v, n)

    def avgs(self) -> Dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}

    def reset(self):
        self.meters.clear()

    def __getitem__(self, key):
        return self.meters[key]


def metrics_to_string(metrics: Dict, prefix: str = "") -> str:
    parts = [f"{k}: {float(v):.4g}" for k, v in metrics.items()]
    return prefix + " | ".join(parts)


def git_sha() -> str:
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL
        ).decode().strip()
    except Exception:
        return "unknown"


def prepare_logger(log_path: str = None, dev: bool = False) -> tuple:
    """Create a timestamped run dir with stream + file logging.

    Returns (logger, log_dir). With dev=True, reuses/wipes '../logdev'
    (reference cvhelpers/misc.py:72-109).
    """
    if dev:
        log_dir = os.path.abspath("logdev")
        shutil.rmtree(log_dir, ignore_errors=True)
    else:
        base = log_path or "logs"
        log_dir = os.path.join(base, time.strftime("%y%m%d_%H%M%S"))
    os.makedirs(log_dir, exist_ok=True)

    logger = logging.getLogger("fgfusion")
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()

    fmt = logging.Formatter(
        "%(asctime)s [%(levelname).1s] %(name)s: %(message)s", "%H:%M:%S")
    stream = logging.StreamHandler(sys.stdout)
    stream.setLevel(logging.INFO)
    stream.setFormatter(fmt)
    logger.addHandler(stream)

    fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
    fh.setLevel(logging.INFO)
    fh.setFormatter(fmt)
    logger.addHandler(fh)

    dbg = logging.FileHandler(os.path.join(log_dir, "debug_logs.txt"))
    dbg.setLevel(logging.DEBUG)
    dbg.setFormatter(fmt)
    logger.addHandler(dbg)

    logger.info("command: %s", " ".join(sys.argv))
    logger.info("git sha: %s", git_sha())
    logger.info("log dir: %s", log_dir)
    return logger, log_dir


class SummaryWriter:
    """Minimal scalar summary sink: JSONL always, TensorBoard when
    tensorboardX is available (reference uses torch TB writers,
    trainer.py:30-33)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter as TBWriter
            self._tb = TBWriter(log_dir)
        except Exception:
            self._tb = None

    def add_scalar(self, tag: str, value, step: int):
        import json
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def add_scalars(self, metrics: Dict, step: int, prefix: str = ""):
        for k, v in metrics.items():
            try:
                self.add_scalar(prefix + k, float(v), step)
            except (TypeError, ValueError):
                pass

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def setup_seed(seed: int):
    """Seed host-side RNGs (reference cvhelpers/torch_helpers.py:86).
    Device randomness in JAX is explicit via PRNG keys, so this only
    covers numpy/python used by the data pipeline."""
    import random
    random.seed(seed)
    import numpy as _np
    _np.random.seed(seed)


def pretty_time_delta(seconds: float) -> str:
    seconds = int(seconds)
    days, seconds = divmod(seconds, 86400)
    hours, seconds = divmod(seconds, 3600)
    minutes, seconds = divmod(seconds, 60)
    if days:
        return f"{days}d{hours}h{minutes}m{seconds}s"
    if hours:
        return f"{hours}h{minutes}m{seconds}s"
    if minutes:
        return f"{minutes}m{seconds}s"
    return f"{seconds}s"
