"""Behavioral tests for the threaded DataLoader's item-future pipeline.

The producer submits item futures across batch boundaries (no per-batch
pool.map barrier) — these pin the contract that pipelining must NOT
change: batch contents/order identical to the synchronous path, prompt
early-stop, and exception propagation mid-pipeline.
"""
import time

import numpy as np
import pytest

from mrefsr_tpu.data.loader import DataLoader


class RecordingDataset:
    """Items carry their index; optional per-item latency."""

    def __init__(self, n, delay_fn=None):
        self.n = n
        self.delay_fn = delay_fn

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay_fn is not None:
            time.sleep(self.delay_fn(i))
        return {'idx': np.asarray(i, np.int64)}


def _collect(loader):
    return [list(b['idx']) for b in loader]


def test_threaded_batches_match_synchronous_order():
    """Stragglers must not reorder items: harvest is in submission
    order even when a head item finishes long after its successors."""
    # item 0 of every batch is the slowest — later items complete first
    ds = RecordingDataset(24, delay_fn=lambda i: 0.03 if i % 4 == 0 else 0)
    ref = _collect(DataLoader(RecordingDataset(24), batch_size=4,
                              num_workers=0))
    got = _collect(DataLoader(ds, batch_size=4, num_workers=3))
    assert got == ref


def test_threaded_respects_sampler_and_drop_last():
    class Sampler:
        def __iter__(self):
            return iter([5, 3, 1, 4, 2])

        def __len__(self):
            return 5

    loader = DataLoader(RecordingDataset(8), batch_size=2,
                        sampler=Sampler(), num_workers=2, drop_last=True)
    assert _collect(loader) == [[5, 3], [1, 4]]


def test_early_break_terminates_producer():
    """Breaking out of the batch iterator must let the producer thread
    wind down (cancel queued futures) instead of decoding the epoch."""
    calls = []

    class Counting(RecordingDataset):
        def __getitem__(self, i):
            calls.append(i)
            time.sleep(0.01)
            return super().__getitem__(i)

    loader = DataLoader(Counting(256), batch_size=4, num_workers=2,
                        prefetch_batches=2)
    for k, _ in enumerate(loader):
        if k == 1:
            break
    # give the producer a moment to observe stop + cancel
    time.sleep(0.5)
    n_after = len(calls)
    time.sleep(0.5)
    assert len(calls) == n_after, 'producer kept decoding after break'
    # bounded lookahead (queue depth + in-flight cap + scheduling
    # slack for batches the producer starts before observing stop),
    # nowhere near the 256-item epoch
    assert n_after <= 48


def test_exception_mid_pipeline_propagates_and_cancels():
    """An item error while later futures are in flight must surface to
    the consumer (not hang) and not strand the pool."""
    ds = RecordingDataset(64, delay_fn=lambda i: 0.005)

    class Bad(RecordingDataset):
        def __getitem__(self, i):
            if i == 9:
                raise ValueError('decode failed')
            return ds[i]

    loader = DataLoader(Bad(64), batch_size=4, num_workers=3)
    with pytest.raises(ValueError, match='decode failed'):
        _collect(loader)
