"""DataLoader behaviour: determinism per (seed, epoch), shuffling,
prefetch correctness, drop_last."""
import numpy as np

from fgfusion_tpu.data.loader import DataLoader


class ToyDataset:
    """Pair dataset with rng-dependent jitter to expose seeding."""

    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx, rng=None):
        rng = rng or np.random.default_rng(0)
        base = np.full((20, 3), float(idx), np.float32)
        return {
            "src_xyz": base + rng.normal(scale=0.1, size=base.shape).astype(np.float32),
            "tgt_xyz": base.copy(),
            "pose": np.eye(4, dtype=np.float32)[:3],
            "src_overlap": np.ones(20, bool),
            "tgt_overlap": np.ones(20, bool),
            "idx": idx,
        }


def collect(loader):
    return [b["src_xyz"].copy() for b in loader]


def test_loader_deterministic_per_epoch():
    a = DataLoader(ToyDataset(), 2, 32, shuffle=True, seed=7)
    b = DataLoader(ToyDataset(), 2, 32, shuffle=True, seed=7)
    ba, bb = collect(a), collect(b)
    assert len(ba) == 5
    for x, y in zip(ba, bb):
        np.testing.assert_array_equal(x, y)


def test_loader_epochs_differ():
    loader = DataLoader(ToyDataset(), 2, 32, shuffle=True, seed=7)
    e0 = collect(loader)  # advances epoch internally
    e1 = collect(loader)
    assert any(not np.array_equal(x, y) for x, y in zip(e0, e1))


def test_loader_seeds_differ():
    a = collect(DataLoader(ToyDataset(), 2, 32, shuffle=True, seed=1))
    b = collect(DataLoader(ToyDataset(), 2, 32, shuffle=True, seed=2))
    assert any(not np.array_equal(x, y) for x, y in zip(a, b))


def test_loader_drop_last_and_len():
    full = DataLoader(ToyDataset(10), 3, 32)
    assert len(full) == 4
    assert len(collect(full)) == 4
    dropped = DataLoader(ToyDataset(10), 3, 32, drop_last=True)
    assert len(dropped) == 3
    assert len(collect(dropped)) == 3


def test_loader_covers_all_items_shuffled():
    loader = DataLoader(ToyDataset(10), 2, 32, shuffle=True, seed=3)
    seen = []
    for batch in loader:
        # first coordinate encodes the item index (+jitter < 0.5)
        seen += list(np.round(batch["src_xyz"][:, 0, 0]).astype(int))
    assert sorted(seen) == list(range(10))


def test_loader_error_propagates():
    class Bad(ToyDataset):
        def __getitem__(self, idx, rng=None):
            raise RuntimeError("boom")

    loader = DataLoader(Bad(), 2, 32)
    import pytest
    with pytest.raises(RuntimeError, match="boom"):
        collect(loader)
