"""Lightweight multi-threaded data loader (torch-free).

Replaces the reference's torch DataLoader + prefetchers
(basicsr/data/prefetch_dataloader.py): worker threads run dataset
``__getitem__`` (cv2/PIL decode and resize release the GIL), batches are
collated into stacked numpy arrays, and a bounded queue gives prefetch
depth. Per-worker seeding keeps the reference's reproducibility contract
(reference basicsr/data/__init__.py:97-101).
"""
import queue
import random
import threading

import numpy as np


def default_collate(samples):
    """Stack a list of {key: array | scalar | str} dicts into batched
    numpy arrays; non-array values become lists."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = vals[0]
        if isinstance(first, np.ndarray):
            out[key] = np.stack(vals, axis=0)
        elif isinstance(first, (int, float, bool, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        elif isinstance(first, tuple) and all(
                isinstance(x, (int, np.integer)) for x in first):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Iterable over collated batches.

    Args:
        dataset: object with __getitem__/__len__.
        batch_size: samples per batch (per host process).
        shuffle: shuffle each epoch when no sampler is given.
        sampler: optional index sampler (e.g. EnlargedSampler).
        num_workers: decode threads; 0 = synchronous.
        drop_last: drop the trailing partial batch.
        seed: base seed for per-epoch shuffles and worker rngs.
        prefetch_batches: bounded queue depth when using workers.
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, sampler=None,
                 num_workers=0, drop_last=False, seed=None,
                 collate_fn=default_collate, prefetch_batches=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.sampler = sampler
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.collate_fn = collate_fn
        self.prefetch_batches = prefetch_batches
        self._epoch = 0

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None \
            else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch):
        self._epoch = epoch
        if self.sampler is not None and hasattr(self.sampler, 'set_epoch'):
            self.sampler.set_epoch(epoch)

    def _indices(self):
        if self.sampler is not None:
            return list(self.sampler)
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            rng = random.Random((self.seed or 0) + self._epoch)
            rng.shuffle(idx)
        return idx

    def _batches(self, indices):
        for i in range(0, len(indices), self.batch_size):
            chunk = indices[i:i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def __iter__(self):
        indices = self._indices()
        if self.num_workers <= 0:
            for chunk in self._batches(indices):
                yield self.collate_fn([self.dataset[j] for j in chunk])
            return

        yield from self._iter_threaded(indices)

    def _iter_threaded(self, indices):
        batch_q = queue.Queue(maxsize=self.prefetch_batches)
        chunks = list(self._batches(indices))
        stop = threading.Event()

        def producer():
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    # Item futures pipelined ACROSS batch boundaries: a
                    # per-batch pool.map would barrier on the slowest
                    # sample of every batch, idling the other workers at
                    # each batch tail. Submission stays in index order
                    # and results are harvested in order, so batch
                    # contents and ordering are identical to the
                    # synchronous path.
                    flat = [j for chunk in chunks for j in chunk]
                    futs = deque()
                    try:
                        pos = 0
                        cap = self.batch_size + max(self.num_workers, 1)
                        cur = []
                        stopped = False
                        for chunk in chunks:
                            while len(cur) < len(chunk):
                                if stop.is_set():
                                    stopped = True
                                    break
                                while pos < len(flat) and len(futs) < cap:
                                    futs.append(pool.submit(
                                        self.dataset.__getitem__,
                                        flat[pos]))
                                    pos += 1
                                cur.append(futs.popleft().result())
                            if stopped:
                                return
                            batch_q.put(self.collate_fn(cur))
                            cur = []
                    finally:
                        # cancel not-yet-started items BEFORE the pool
                        # context waits on shutdown (both on early stop
                        # and on a worker exception)
                        while futs:
                            futs.popleft().cancel()
            except BaseException as e:  # noqa: B036
                # hand the error to the consumer — a dead producer with
                # no sentinel would leave the train loop blocked forever
                batch_q.put(e)
                return
            batch_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = batch_q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    batch_q.get_nowait()
                except queue.Empty:
                    break
