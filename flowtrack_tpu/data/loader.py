"""Batched, prefetching data loader.

Replaces the reference's torch DataLoader + N worker processes (SURVEY.md
section 4.1 process boundary): a thread pool decodes/augments items (cv2 and
numpy release the GIL for the heavy parts), batches are collated into dense
numpy arrays, and an optional double-buffer prefetches the next batch to
device while the current one computes — the host never blocks the TPU.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np


def collate(items) -> Dict[str, np.ndarray]:
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        out[key] = np.stack([np.asarray(v) for v in vals])
    return out


class BatchLoader:
    """Iterate dicts of stacked numpy arrays over a PoseDataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 8,
                 pad_to_batch: bool = False, seed: int = 0,
                 prefetch_batches: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.pad_to_batch = pad_to_batch
        self.rng = np.random.default_rng(seed)
        self.prefetch_batches = prefetch_batches
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i: i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def _make_batch(self, pool, chunk):
        items = list(pool.map(self.dataset.__getitem__, chunk))
        batch = collate(items)
        n_valid = len(items)
        if self.pad_to_batch and n_valid < self.batch_size:
            pad = self.batch_size - n_valid
            batch = {k: np.concatenate(
                [v, np.repeat(v[-1:], pad, axis=0)]) for k, v in batch.items()}
        batch["n_valid"] = np.asarray(n_valid)
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        sentinel = object()
        stop = threading.Event()
        # advance the dataset's per-epoch augmentation stream (each item
        # derives a thread-safe Generator from (seed, epoch, idx))
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)
        self._epoch += 1

        def bounded_put(item):
            # a put that gives up if the consumer abandoned iteration —
            # otherwise the producer blocks forever on the full queue and
            # leaks a thread (+ its pool) per abandoned epoch
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # a failing __getitem__/collate must surface in the consumer,
            # not silently truncate the epoch (advisor finding): ship the
            # exception through the queue and re-raise it from __iter__
            with ThreadPoolExecutor(self.num_workers) as pool:
                try:
                    for chunk in self._batch_indices():
                        if stop.is_set():
                            return
                        if not bounded_put(self._make_batch(pool, chunk)):
                            return
                except BaseException as e:  # noqa: BLE001 - relayed below
                    bounded_put(e)
                finally:
                    bounded_put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            while True:  # unblock a producer waiting on a full queue
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join()


def device_prefetch(iterator, sharding=None, size: int = 2):
    """Overlap H2D transfer with compute: keep ``size`` batches in flight."""
    import collections

    import jax

    buf = collections.deque()

    def put(batch):
        n_valid = batch.pop("n_valid", None)
        if sharding is not None:
            batch = jax.tree.map(
                lambda x: jax.device_put(x, sharding), batch)
        else:
            batch = jax.tree.map(jax.device_put, batch)
        if n_valid is not None:
            batch["n_valid"] = int(n_valid)
        return batch

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
