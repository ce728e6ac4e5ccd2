"""Host->device prefetchers.

Rebuild of reference basicsr/data/prefetch_dataloader.py: the
CUDAPrefetcher's side-stream H2D copies become ``jax.device_put``
double-buffering — the next batch's transfer overlaps the current step's
compute because device_put is async under jax's dispatch model. The
thread-queue PrefetchGenerator/PrefetchDataLoader (reference :7-60) are
subsumed by the threaded loader itself (data/loader.py): its worker
pool + bounded queue prefetch whole collated batches.
"""
import jax


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
