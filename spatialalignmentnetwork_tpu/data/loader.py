"""Host-side batching loader with threaded prefetch.

The reference uses torch DataLoader worker processes (train.py:155-160);
h5py slice reads are IO-bound and release the GIL, so a thread pool feeding
a small prefetch queue keeps the accelerator busy without process-fork
overhead. Batches are stacked numpy arrays ready for device transfer; the
jitted step does all math on device.
"""

import threading
import queue
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class Prefetch:
    """Materialize an entire dataset into RAM (reference train.py:24-33)."""

    def __init__(self, dataset, workers=8):
        with ThreadPoolExecutor(workers) as ex:
            self.items = list(ex.map(lambda i: dataset[i], range(len(dataset))))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, ind):
        return self.items[ind]


def device_prefetch(iterator, size=2):
    """Overlap host->device transfer with compute: keep `size` batches
    already transferred (jax transfers are async; holding references to
    in-flight device arrays is enough to pipeline them)."""
    import collections

    from ..utils.transfer import to_device

    buf = collections.deque()
    for batch in iterator:
        buf.append([to_device(x) for x in batch])
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


class Loader:
    """Iterate batches of stacked modality lists.

    Each dataset item is a list [target, aux, ...] of [C, H, W] arrays;
    a batch is a list of [N, C, H, W] stacked arrays (one per modality).

    Multi-host sharding (SURVEY §5.8): with num_shards=P, shard_index=p,
    every process draws the SAME global permutation (callers must pass the
    same seed on every host) in global batches of batch_size*P rows, and
    this loader yields only rows [p*B, (p+1)*B) of each global batch — so
    the P processes load disjoint rows whose union is exactly the global
    batch, ready for jax.make_array_from_process_local_data assembly
    (parallel.mesh.shard_batch_multihost).
    """

    def __init__(self, dataset, batch_size, shuffle=False, drop_last=False,
                 num_workers=4, prefetch_batches=2, seed=0,
                 num_shards=1, shard_index=0):
        assert 0 <= shard_index < num_shards
        assert num_shards == 1 or drop_last, (
            "sharded loading requires drop_last=True so every process "
            "yields the same number of equal-size batches"
        )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = prefetch_batches
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.num_shards = num_shards
        self.shard_index = shard_index

    def __len__(self):
        n = len(self.dataset)
        global_bs = self.batch_size * self.num_shards
        if self.drop_last:
            return n // global_bs
        return (n + global_bs - 1) // global_bs

    def _batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        global_bs = self.batch_size * self.num_shards
        lo = self.shard_index * self.batch_size
        for b in range(nb):
            gbatch = order[b * global_bs : (b + 1) * global_bs]
            yield gbatch[lo : lo + self.batch_size]

    def _fetch(self, indices):
        if hasattr(self.dataset, "batch"):
            # native batch assembly (data.native_cache.NativePairedSlices):
            # one OpenMP crop+complexify pass instead of per-item reads
            return self.dataset.batch(np.asarray(indices))
        items = [self.dataset[int(i)] for i in indices]
        n_mod = len(items[0])
        return [np.stack([it[m] for it in items], axis=0) for m in range(n_mod)]

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch_batches)
        stop = object()
        cancel = threading.Event()

        def put(item):
            """Bounded put that gives up once the consumer is gone —
            a plain q.put would block forever when the iterator is
            abandoned mid-epoch (e.g. train.py's intel_stop break),
            pinning the producer thread + its fetched batches for the
            rest of the process."""
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # keep a bounded window of in-flight fetches so memory stays
            # O(workers + prefetch) batches. A worker exception is shipped
            # to the consumer and re-raised there — dying without a
            # sentinel would leave the training loop blocked on q.get()
            # forever instead of surfacing the data error.
            from collections import deque

            try:
                window = deque()
                with ThreadPoolExecutor(self.num_workers) as ex:
                    for idx in self._batches():
                        if cancel.is_set():
                            return
                        window.append(ex.submit(self._fetch, idx))
                        while len(window) >= self.num_workers:
                            if not put(window.popleft().result()):
                                return
                    while window:
                        if not put(window.popleft().result()):
                            return
                put(stop)
            except BaseException as e:  # noqa: BLE001 — relayed, not hidden
                put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # runs on normal exhaustion AND on abandonment (GeneratorExit):
            # release the producer, then drain whatever it already queued
            cancel.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
