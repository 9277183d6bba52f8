"""Utility coverage: image grids, flock arbitration, loader edge cases."""

import threading
import time

import numpy as np

from spatialalignmentnetwork_tpu.utils.visualize import make_grid, save_image
from spatialalignmentnetwork_tpu.utils.autotpu import Locker
from spatialalignmentnetwork_tpu.data.loader import Loader, device_prefetch


def test_make_grid_shapes_and_range():
    batch = np.random.default_rng(0).random((6, 1, 8, 8)).astype(np.float32)
    grid = make_grid(batch, nrow=4, padding=2)
    # 2 rows x 4 cols of 8px tiles + 3px/5px padding seams
    assert grid.shape == (2 * 8 + 3 * 2, 4 * 8 + 5 * 2, 3)
    assert grid.dtype == np.uint8
    # 3-channel input passes through
    rgb = np.random.default_rng(1).random((2, 3, 8, 8)).astype(np.float32)
    g2 = make_grid(rgb, nrow=2)
    assert g2.shape[-1] == 3


def test_save_image_writes_jpeg(tmp_path):
    batch = np.random.default_rng(2).random((4, 1, 8, 8)).astype(np.float32)
    path = str(tmp_path / "grid.jpg")
    save_image(batch, path, nrow=2)
    import os

    assert os.path.getsize(path) > 0


def test_locker_mutual_exclusion(tmp_path):
    path = str(tmp_path / "lock")
    a = Locker(path)
    assert a.acquire(blocking=False)
    b = Locker(path)
    assert not b.acquire(blocking=False)  # held by a
    a.release()
    assert b.acquire(blocking=False)
    b.release()


def test_locker_blocks_until_released(tmp_path):
    path = str(tmp_path / "lock")
    a = Locker(path)
    a.acquire()
    got = []

    def taker():
        with Locker(path):
            got.append(time.time())

    t = threading.Thread(target=taker)
    t.start()
    time.sleep(0.3)
    assert not got  # still blocked
    released_at = time.time()
    a.release()
    t.join(timeout=5)
    assert got and got[0] >= released_at


class _ListDataset:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_loader_remainder_batch():
    items = [[np.full((1, 4, 4), i, np.float32)] for i in range(7)]
    ds = _ListDataset(items)
    loader = Loader(ds, batch_size=3, shuffle=False, drop_last=False)
    batches = list(loader)
    assert [b[0].shape[0] for b in batches] == [3, 3, 1]
    np.testing.assert_array_equal(
        batches[2][0][0], np.full((1, 4, 4), 6, np.float32)
    )


def test_device_prefetch_order():
    items = [[np.full((1, 2, 2), i, np.float32)] for i in range(5)]
    ds = _ListDataset(items)
    loader = Loader(ds, batch_size=1, shuffle=False)
    out = [int(np.asarray(b[0])[0, 0, 0, 0]) for b in device_prefetch(iter(loader))]
    assert out == [0, 1, 2, 3, 4]

def test_marginal_timing_strips_fixed_cost(monkeypatch):
    """utils.timing.marginal_time subtracts the per-call fixed cost: with
    a fake chain costing fixed + n*per_iter, the estimate recovers
    per_iter exactly. Deterministic: the helper's clock is faked (a real
    sleep-based version is scheduler-noise flaky on loaded CI boxes)."""
    import types

    from spatialalignmentnetwork_tpu.utils import timing

    FIXED, PER_ITER = 0.05, 0.004
    clock = [0.0]
    fake_time = types.SimpleNamespace(perf_counter=lambda: clock[0])
    monkeypatch.setattr(timing, "time", fake_time)

    def make_chain(n):
        def run():
            clock[0] += FIXED + n * PER_ITER
            return 0.0
        return run

    est = timing.marginal_time(make_chain, (), iters=5, repeats=2)
    assert abs(est - PER_ITER) < 1e-12, est
