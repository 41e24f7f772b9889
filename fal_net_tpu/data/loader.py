"""Host-side batching + double-buffered device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=4)``
(Train_Stage1_K.py:156-160) with a thread-pool decoder (PIL/numpy release
the GIL) and an explicit device-prefetch queue so the next batch's H2D copy
overlaps the current step's compute.  With a ``jax.sharding.Sharding`` the
batch lands pre-sharded across the mesh's data axis.
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np


def _collate(samples) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], str):
            out[key] = vals  # file names
        elif isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]) or isinstance(vals[0], np.floating):
            out[key] = np.stack([np.asarray(v) for v in vals])
        else:
            out[key] = vals  # variable-size target lists
    return out


class DataLoader:
    """Iterates a dataset (``len`` + ``get(index, rng)``) in batches.

    Each epoch reshuffles with a per-epoch seed; each sample's augmentation
    rng is derived from (seed, epoch, index) so runs are reproducible and
    workers race-free.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        drop_last: bool = True,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        """``shard_id``/``num_shards``: multi-host data parallelism — each
        host iterates a disjoint slice of every epoch's permutation (the
        same seed derivation keeps hosts in lockstep), and ``batch_size``
        is the per-host batch.  Pair with
        ``jax.process_index()/process_count()`` on multi-host pods."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _shard_len(self) -> int:
        return len(self.dataset) // self.num_shards

    def __len__(self) -> int:
        n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(order)
        if self.num_shards > 1:
            order = order[self.shard_id :: self.num_shards][: self._shard_len()]
        n = len(order)
        nb = len(self)

        def fetch(i: int):
            rng = np.random.default_rng((self.seed, self.epoch, int(i)))
            return self.dataset.get(int(i), rng)

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = collections.deque()
            idx = 0
            for b in range(nb):
                hi = min((b + 2) * self.batch_size, n)  # keep ~2 batches in flight
                while idx < hi:
                    pending.append(pool.submit(fetch, order[idx]))
                    idx += 1
                batch = [pending.popleft().result() for _ in range(
                    min(self.batch_size, n - b * self.batch_size))]
                yield _collate(batch)


def prefetch_to_device(
    iterator: Iterator[Dict[str, Any]],
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator[Dict[str, Any]]:
    """Double-buffer: stage upcoming batches onto device while compute runs.

    Only ndarray values are transferred; string/list fields pass through.
    """

    def put(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and np.issubdtype(v.dtype, np.number):
                out[k] = jax.device_put(v, sharding) if sharding is not None else jax.device_put(v)
            else:
                out[k] = v
        return out

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []
    stop = threading.Event()

    def producer():
        try:
            for batch in iterator:
                staged = put(batch)
                # A consumer that stops early (epoch_size truncation) would
                # otherwise leave this thread blocked on a full queue forever,
                # leaking the thread + its device-resident batches.
                while not stop.is_set():
                    try:
                        q.put(staged, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            # Deliver the sentinel with the same stop-aware retry: on normal
            # completion the queue may be full of unconsumed batches, and a
            # dropped sentinel would hang the consumer's final get().
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
