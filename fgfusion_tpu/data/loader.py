"""Host-side input pipeline: dataset dispatch, shuffling, fixed-shape
collation, and background prefetch.

Replaces the reference's torch DataLoader + list-collate
(data_loaders/__init__.py:12-77) with a numpy pipeline that emits
XLA-ready padded batches. Parallelism comes from a thread pool reading
ahead `prefetch` batches (dataset __getitem__ is numpy/IO-bound and
releases the GIL in the hot parts); randomness is explicit via
per-(epoch, index) Generators so runs are reproducible regardless of
worker scheduling — unlike the reference's global-RNG workers.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np

from .buckets import collate_pairs
from .transforms import train_transforms


def make_dataset(cfg, phase: str):
    name = cfg["dataset"]
    tfs = train_transforms(cfg) if phase == "train" else None
    if name == "3dmatch":
        from .threedmatch import ThreeDMatchDataset
        return ThreeDMatchDataset(cfg, phase, transforms=tfs)
    if name == "modelnet":
        from .modelnet import ModelNetHdf, read_category_file
        key = {"train": "train_categoryfile", "val": "val_categoryfile",
               "test": "test_categoryfile"}[phase]
        cats = read_category_file(cfg[key]) if cfg.get(key) else None
        subset = "train" if phase == "train" else "test"
        return ModelNetHdf(cfg, cfg["root"], subset=subset, categories=cats,
                           deterministic=(phase == "test"))
    if name in ("mcd", "MCD_KTH"):
        from .mcd import MCDDataset
        return MCDDataset(cfg, phase, transforms=tfs)
    raise ValueError(f"unknown dataset {name!r}")


class DataLoader:
    """Iterates fixed-shape batches. `point_capacity` is the level-0
    bucket size N0; oversized clouds are randomly subsampled to fit
    (the reference caps at 30k via ShufflePoints — transforms.py:98)."""

    def __init__(self, dataset, batch_size: int, point_capacity: int,
                 shuffle: bool = False, seed: int = 0, drop_last: bool = False,
                 prefetch: int = 2, num_workers: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.n0 = point_capacity
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_workers = max(1, num_workers)
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _item(self, idx: int):
        rng = np.random.default_rng((self.seed, self.epoch, idx))
        try:
            return self.dataset.__getitem__(idx, rng=rng)
        except TypeError:
            return self.dataset[idx]

    def _batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(order)
        for i in range(0, len(order), self.batch_size):
            chunk = order[i:i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            yield chunk

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        work = queue.Queue(maxsize=self.prefetch)
        done = object()

        def producer():
            """Reads items through a real num_workers-wide thread pool
            (numpy/h5py/torch-load release the GIL in the hot parts) and
            keeps `prefetch` batches of item-futures in flight, so IO
            for batch k+1..k+prefetch overlaps the consumer's step k.
            Determinism is unaffected: randomness is keyed by
            (seed, epoch, index), never by worker scheduling."""
            import collections
            from concurrent.futures import ThreadPoolExecutor
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    chunks = iter(self._batches())
                    pending = collections.deque()

                    def submit_next():
                        chunk = next(chunks, None)
                        if chunk is None:
                            return False
                        pending.append(
                            (chunk,
                             [pool.submit(self._item, int(j)) for j in chunk]))
                        return True

                    for _ in range(self.prefetch + 1):
                        if not submit_next():
                            break
                    batch_idx = 0
                    while pending:
                        chunk, futures = pending.popleft()
                        samples = [f.result() for f in futures]
                        rng = np.random.default_rng(
                            (self.seed, self.epoch, 1 << 20, batch_idx))
                        batch = collate_pairs(samples, self.n0, rng)
                        batch["idx"] = np.asarray(
                            [s.get("idx", -1) for s in samples])
                        work.put(batch)
                        batch_idx += 1
                        submit_next()
            except BaseException as e:  # surface loader errors to the consumer
                work.put(e)
            finally:
                work.put(done)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = work.get()
            if item is done:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        self.epoch += 1


def get_dataloader(cfg, phase: str, num_workers: int = 2) -> DataLoader:
    """Reference-parity entry point (data_loaders/__init__.py:12)."""
    dataset = make_dataset(cfg, phase)
    batch_size = cfg.get(f"{phase}_batch_size", 1)
    n0 = int(cfg.get("point_capacity",
                     1024 if cfg["dataset"] == "modelnet" else 16384))
    return DataLoader(dataset, batch_size, n0,
                      shuffle=(phase == "train"),
                      seed=cfg.get("seed", 0),
                      num_workers=num_workers)
