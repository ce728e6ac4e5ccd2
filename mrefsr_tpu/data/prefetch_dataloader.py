"""Host->device prefetchers.

Rebuild of reference basicsr/data/prefetch_dataloader.py: the
CUDAPrefetcher's side-stream H2D copies become ``jax.device_put``
double-buffering — the next batch's transfer overlaps the current step's
compute because device_put is async under jax's dispatch model. The
thread-queue PrefetchGenerator/PrefetchDataLoader (reference :7-60) are
subsumed by the threaded loader itself (data/loader.py): its worker
pool + bounded queue prefetch whole collated batches.

BackgroundDevicePrefetcher is the production path (``prefetch_mode:
device``): a dedicated thread issues the H2D transfers so they overlap
device compute even when ``device_put`` blocks the calling thread (a
remote-device tunnel serializes transfers against the dispatching
thread — measured at ~7 s of a 19 s 16-step wave). It also finishes the
uint8 pipeline: batches shipped as uint8 (see MultiRefMegaDepthDataset
``output_dtype: uint8``) cross the link at 1 byte/px and become
f32 in [0,1] via an on-device cast+scale — the same
``astype(f32)/255.`` the host would run, bit-exactly.
"""
import queue
import threading

import jax
import jax.numpy as jnp


class CPUPrefetcher:
    """Plain pass-through iterator (reference :63-81)."""

    def __init__(self, loader):
        self.ori_loader = loader
        self.loader = iter(loader)

    def next(self):
        try:
            return next(self.loader)
        except StopIteration:
            return None

    def reset(self):
        self.loader = iter(self.ori_loader)


class DevicePrefetcher:
    """Double-buffered device_put prefetcher (replaces CUDAPrefetcher,
    reference :84-125). ``sharding`` optionally places batches directly
    into a mesh sharding so multi-chip feeds skip the host staging copy.
    """

    def __init__(self, loader, opt=None, sharding=None,
                 device_keys=None):
        self.ori_loader = loader
        self.sharding = sharding
        self.device_keys = device_keys
        self.loader = iter(loader)
        self.batch = None
        self.preload()

    def _put(self, batch):
        out = {}
        for k, v in batch.items():
            if self.device_keys is not None and k not in self.device_keys:
                out[k] = v
                continue
            if hasattr(v, 'dtype') and v.dtype.kind == 'f':
                from mrefsr_tpu.parallel import put_sharded
                out[k] = put_sharded(v, self.sharding) \
                    if self.sharding is not None \
                    else jax.device_put(v)
            else:
                out[k] = v
        return out

    def preload(self):
        try:
            self.batch = self._put(next(self.loader))
        except StopIteration:
            self.batch = None

    def next(self):
        batch = self.batch
        self.preload()
        return batch

    def reset(self):
        self.loader = iter(self.ori_loader)
        self.preload()


class BackgroundDevicePrefetcher:
    """Device prefetcher with the H2D transfers on their OWN thread.

    Double-buffered ``device_put`` on the train-loop thread cannot
    overlap compute when the transfer blocks its caller (remote-device
    tunnels do); here a daemon thread drains the loader, places every
    image array onto the mesh sharding, and feeds a bounded queue of
    ready-on-device batches, so wave N+1's transfers ride under wave
    N's compute.

    uint8 arrays (``output_dtype: uint8`` datasets) are converted on
    device to float32 in [0, 1] with the exact host formula
    ``astype(float32) / 255.`` — one fused elementwise op per key,
    dispatched asynchronously.

    Args:
        loader: iterable of collated numpy batches.
        sharding: jax sharding for the batch axis (None = default
            device).
        device_keys: keys to transfer; None = every float array, plus
            every uint8 array with ndim >= 3 (image tensors).
        depth: queue depth in batches. Size it to >= steps_per_dispatch
            so a full wave can stage while the previous one computes.
    """

    def __init__(self, loader, opt=None, sharding=None, device_keys=None,
                 depth=None):
        self.ori_loader = loader
        self.sharding = sharding
        self.device_keys = device_keys
        if depth is None:
            train_opt = (opt or {}).get('train') or {}
            depth = 2 * int(train_opt.get('steps_per_dispatch') or 1)
        self.depth = max(int(depth), 2)
        self._queue = None
        self._thread = None
        self._stop = None
        self._done = False
        # the producer starts lazily (first next() or an explicit
        # reset()): the train loop resets per epoch AFTER
        # sampler.set_epoch, so batches decoded+transferred by an
        # eagerly-started producer would be discarded at the first
        # reset

    def _transfer(self, k, v):
        if self.device_keys is not None:
            if k not in self.device_keys:
                return v
        elif not (hasattr(v, 'dtype') and (
                v.dtype.kind == 'f'
                or (v.dtype == 'uint8' and v.ndim >= 3))):
            return v
        if self.sharding is not None:
            from mrefsr_tpu.parallel import put_sharded
            dev = put_sharded(v, self.sharding)
        else:
            dev = jax.device_put(v)
        if dev.dtype == jnp.uint8:
            dev = dev.astype(jnp.float32) / 255.
        return dev

    @staticmethod
    def _put_until_stop(q, stop, item):
        """Put honoring the stop flag; True if delivered."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def _producer(self):
        q, stop = self._queue, self._stop
        try:
            for batch in self.ori_loader:
                out = {k: self._transfer(k, v) for k, v in batch.items()}
                if not self._put_until_stop(q, stop, out):
                    return
        except BaseException as e:  # noqa: B036
            # surface loader/transfer errors on the consumer side — a
            # silently dead producer would hang the train loop
            self._put_until_stop(q, stop, e)
            return
        self._put_until_stop(q, stop, None)

    def next(self):
        if self._thread is None:
            self.reset()
        if self._done:
            # the epoch's single end sentinel was already consumed;
            # keep returning None like CPU/DevicePrefetcher do (the
            # wave loop's tail-batch collection eats the sentinel and
            # the loop bottom calls next() once more — a blocking get()
            # here would hang training at any epoch whose length is not
            # a multiple of steps_per_dispatch)
            return None
        batch = self._queue.get()
        if isinstance(batch, BaseException):
            raise batch
        if batch is None:
            self._done = True
        return batch

    def reset(self):
        if self._stop is not None:
            self._stop.set()
            # unblock a producer parked on a full queue
            while self._thread.is_alive():
                try:
                    self._queue.get_nowait()
                except queue.Empty:
                    self._thread.join(timeout=0.1)
        self._done = False
        self._stop = threading.Event()
        self._queue = queue.Queue(maxsize=self.depth)
        self._thread = threading.Thread(target=self._producer,
                                        daemon=True)
        self._thread.start()
