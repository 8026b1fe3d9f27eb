"""Host input pipeline (data/loader.py): batching/sharding semantics and
the failure paths — a raising dataset must error the consumer promptly
(the reference DataLoader's worker-error propagation), never hang it."""

import time

import numpy as np
import pytest

from simpleaicv_pytorch_training_examples_tpu.data.loader import (
    Compose, DataLoader)


class _ArangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.int64)}


def _collate(samples):
    return {"x": np.stack([s["x"] for s in samples])}


def test_loader_order_sharding_and_drop_last():
    ds = _ArangeDataset(10)
    loader = DataLoader(ds, 4, _collate, shuffle=False, drop_last=True,
                        num_workers=2)
    batches = [b["x"][:, 0].tolist() for b in loader]
    assert batches == [[0, 1, 2, 3], [4, 5, 6, 7]]  # tail dropped

    keep = DataLoader(ds, 4, _collate, shuffle=False, drop_last=False,
                      num_workers=2)
    assert len(keep) == 3
    assert [len(b["x"]) for b in keep] == [4, 4, 2]

    # multihost: each process loads its contiguous slice of the global batch
    p0 = DataLoader(ds, 4, _collate, shuffle=False, drop_last=True,
                    process_index=0, process_count=2, num_workers=1)
    p1 = DataLoader(ds, 4, _collate, shuffle=False, drop_last=True,
                    process_index=1, process_count=2, num_workers=1)
    b0 = [b["x"][:, 0].tolist() for b in p0]
    b1 = [b["x"][:, 0].tolist() for b in p1]
    assert b0 == [[0, 1], [4, 5]]
    assert b1 == [[2, 3], [6, 7]]


def test_loader_epoch_reshuffle_deterministic():
    ds = _ArangeDataset(16)
    loader = DataLoader(ds, 8, _collate, shuffle=True, seed=3,
                        num_workers=2)
    loader.set_epoch(1)
    e1 = [b["x"][:, 0].tolist() for b in loader]
    loader.set_epoch(2)
    e2 = [b["x"][:, 0].tolist() for b in loader]
    loader.set_epoch(1)
    e1b = [b["x"][:, 0].tolist() for b in loader]
    assert e1 == e1b        # same epoch -> same order
    assert e1 != e2         # different epoch -> reshuffled
    assert sorted(sum(e1, [])) == list(range(16))  # a true permutation


class _FailingDataset(_ArangeDataset):
    def __getitem__(self, i):
        if i == 5:
            raise RuntimeError("corrupt sample 5")
        return super().__getitem__(i)


def test_loader_raises_instead_of_hanging():
    """A producer-side exception must surface in the consumer within a
    bounded time (ADVICE round-1: a dead producer used to leave the
    consumer blocked on the queue forever)."""
    ds = _FailingDataset(8)
    loader = DataLoader(ds, 4, _collate, shuffle=False, drop_last=True,
                        num_workers=2)
    t0 = time.time()
    with pytest.raises(RuntimeError, match="corrupt sample 5"):
        for _ in loader:
            pass
    assert time.time() - t0 < 30


def test_loader_early_break_does_not_wedge():
    """Breaking out mid-epoch must stop the producer thread (the stop
    event + drain path), not leave it blocked on a full queue."""
    import threading

    before = threading.active_count()
    ds = _ArangeDataset(64)
    loader = DataLoader(ds, 4, _collate, shuffle=False, drop_last=True,
                        num_workers=2, prefetch=1)
    for i, _ in enumerate(loader):
        if i == 1:
            break
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_compose_chains_dict_transforms():
    def add1(s):
        s["x"] = s["x"] + 1
        return s

    def double(s):
        s["x"] = s["x"] * 2
        return s

    out = Compose([add1, double])({"x": np.asarray([1, 2])})
    np.testing.assert_array_equal(out["x"], [4, 6])
