"""Host->HBM input pipeline: threaded decode workers + double-buffered
device prefetch.

The reference used torch DataLoader(num_workers=1) and a blocking
``.cuda()`` per step (reference: train_DiGA_gta2city_warm_up.py:119,218-230).
Here decode/augment runs in a thread pool while the TPU computes, and
``device_prefetch`` keeps ``buffer_size`` batches resident on device so the
train step never waits on PCIe/DMA.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np

from .datasets import EpochShuffleSampler, SegDataset, collate


class BatchLoader:
    """Infinite batches from a SegDataset using worker threads.

    PIL/numpy decode releases the GIL for most of the work, so threads are
    an effective worker pool without process-spawn overhead.
    """

    def __init__(
        self,
        dataset: SegDataset,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        num_workers: int = 4,
        host_id: int = 0,
        host_count: int = 1,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.host_id = host_id
        self.host_count = host_count
        self.sampler = EpochShuffleSampler(
            len(dataset), seed=seed, shuffle=shuffle,
            host_id=host_id, host_count=host_count,
        )
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._started = False
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []

    def _producer(self, worker_id: int):
        # Layout-independence contract: global batch b spans stream
        # positions [b*Bg, (b+1)*Bg) where Bg = batch_size * host_count;
        # host h builds the CONTIGUOUS rows starting at b*Bg + h*batch_size,
        # and every sample's aug RNG is keyed by (seed, its stream
        # position).  Concat over hosts therefore equals the 1-host batch
        # bit for bit, for any worker count or process layout.
        bg = self.batch_size * self.host_count
        base = self.host_id * self.batch_size
        batch_idx = worker_id
        while not self._stop.is_set():
            if batch_idx % self.num_workers == worker_id:
                positions = [batch_idx * bg + base + j
                             for j in range(self.batch_size)]
                samples = [
                    self.dataset.__getitem__(
                        self.sampler.index_at(p),
                        rng=np.random.default_rng((self.seed, p)))
                    for p in positions
                ]
                try:
                    self._q.put((batch_idx, collate(samples)), timeout=60.0)
                except queue.Full:
                    if self._stop.is_set():
                        return
            batch_idx += 1

    def start(self):
        if self._started:
            return
        self._started = True
        for w in range(self.num_workers):
            t = threading.Thread(target=self._producer, args=(w,), daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self):
        self._stop.set()
        # drain so producers blocked on put() can exit
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self) -> Iterator[dict]:
        self.start()
        # re-order batches produced by concurrent workers
        pending: dict[int, dict] = {}
        want = 0
        while True:
            while want not in pending:
                idx, batch = self._q.get()
                pending[idx] = batch
            yield pending.pop(want)
            want += 1


def device_prefetch(iterator, sharding=None, buffer_size: int = 2):
    """Move host batches to device ahead of consumption (double buffering).

    ``sharding`` may be a ``jax.sharding.NamedSharding`` to scatter the
    batch over a mesh's data axis; arrays land sharded without a gather.

    Multi-host: each process feeds only its LOCAL batch rows (the loaders
    are host-sharded, EpochShuffleSampler); the rows are assembled into
    one global array spanning the mesh via
    ``jax.make_array_from_process_local_data`` — no cross-host data
    transfer ever happens for input batches.
    """
    buf = []
    multiproc = jax.process_count() > 1

    def put_one(v):
        if sharding is None:
            return jax.device_put(v)
        if multiproc:
            gshape = (v.shape[0] * jax.process_count(), *v.shape[1:])
            return jax.make_array_from_process_local_data(sharding, v, gshape)
        return jax.device_put(v, sharding)

    def put(batch):
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        rest = {k: v for k, v in batch.items() if not isinstance(v, np.ndarray)}
        dev = {k: put_one(v) for k, v in arrays.items()}
        dev.update(rest)
        return dev

    it = iter(iterator)
    for _ in range(buffer_size):
        try:
            buf.append(put(next(it)))
        except StopIteration:
            break
    while buf:
        yield buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
