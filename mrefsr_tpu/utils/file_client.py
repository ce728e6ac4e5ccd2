"""IO backends (disk / LMDB / memcached) behind a FileClient facade.

Rebuild of reference basicsr/utils/file_client.py:22-167. LMDB and
memcached imports are gated since neither is guaranteed in the TPU image.
"""
import threading
from abc import ABCMeta, abstractmethod


class BaseStorageBackend(metaclass=ABCMeta):
    """Abstract storage backend: ``get`` bytes, ``get_text`` str."""

    @abstractmethod
    def get(self, filepath):
        pass

    @abstractmethod
    def get_text(self, filepath):
        pass


def _normalize_paths(db_paths, client_keys, what):
    """Shared db_paths/client_keys normalization for the keyed backends:
    str/Path or a sequence of them -> list of str, length-checked."""
    if isinstance(client_keys, str):
        client_keys = [client_keys]
    if isinstance(db_paths, (str,)) or hasattr(db_paths, '__fspath__'):
        db_paths = [db_paths]
    db_paths = [str(v) for v in db_paths]
    if len(client_keys) != len(db_paths):
        raise ValueError(
            f'client_keys and db_paths should have the same length for '
            f'{what}, but received {len(client_keys)} and '
            f'{len(db_paths)}.')
    return db_paths, list(client_keys)


class MemcachedBackend(BaseStorageBackend):
    """Memcached storage backend (reference file_client.py:22-55)."""

    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        if sys_path is not None:
            import sys
            sys.path.append(sys_path)
        try:
            import mc
        except ImportError:
            raise ImportError(
                'Please install memcached to enable MemcachedBackend.')
        self.server_list_cfg = server_list_cfg
        self.client_cfg = client_cfg
        self._client = mc.MemcachedClient.GetInstance(self.server_list_cfg,
                                                      self.client_cfg)
        # thread-LOCAL receive buffer: this framework's loader workers
        # are threads sharing one FileClient (the reference's shared
        # buffer is safe only with process workers) — a shared pyvector
        # would return another thread's (or torn) bytes
        self._local = threading.local()

    def get(self, filepath):
        import mc
        filepath = str(filepath)
        buf = getattr(self._local, 'mc_buffer', None)
        if buf is None:
            buf = self._local.mc_buffer = mc.pyvector()
        self._client.Get(filepath, buf)
        return mc.ConvertBuffer(buf)

    def get_text(self, filepath):
        raise NotImplementedError


class HardDiskBackend(BaseStorageBackend):
    """Raw filesystem backend (reference file_client.py:58-71)."""

    def get(self, filepath):
        with open(str(filepath), 'rb') as f:
            return f.read()

    def get_text(self, filepath):
        with open(str(filepath), 'r') as f:
            return f.read()


class LmdbBackend(BaseStorageBackend):
    """LMDB backend supporting multiple named envs
    (reference file_client.py:74-129)."""

    def __init__(self,
                 db_paths,
                 client_keys='default',
                 readonly=True,
                 lock=False,
                 readahead=False,
                 **kwargs):
        try:
            import lmdb
        except ImportError:
            raise ImportError('Please install lmdb to enable LmdbBackend.')

        self.db_paths, client_keys = _normalize_paths(
            db_paths, client_keys, 'LmdbBackend')
        self._client = {}
        for client, path in zip(client_keys, self.db_paths):
            self._client[client] = lmdb.open(path, readonly=readonly,
                                             lock=lock, readahead=readahead,
                                             **kwargs)

    def get(self, filepath, client_key):
        filepath = str(filepath)
        assert client_key in self._client, (
            f'client_key {client_key} is not in lmdb clients.')
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            value_buf = txn.get(filepath.encode('ascii'))
        if value_buf is None:
            # raise HERE like PackBackend, not a far-away TypeError in
            # imfrombytes (stale meta_info vs lmdb contents)
            raise KeyError(
                f'key {filepath!r} not found in lmdb {client_key!r}')
        return value_buf

    def get_text(self, filepath):
        raise NotImplementedError


class PackBackend(BaseStorageBackend):
    """Native mmap packed-shard backend (this framework's TPU-native
    LMDB replacement; see native/packio.cpp): zero-copy reads from one
    immutable shard file per dataset. Accepts the same db_paths /
    client_keys interface as LmdbBackend so datasets can switch with
    ``io_backend: {type: pack}``."""

    def __init__(self, db_paths, client_keys='default', **kwargs):
        from mrefsr_tpu.data.packio import PackReader
        db_paths, client_keys = _normalize_paths(db_paths, client_keys,
                                                 'PackBackend')
        self._client = {key: PackReader(path)
                        for key, path in zip(client_keys, db_paths)}

    def get(self, filepath, client_key):
        assert client_key in self._client, (
            f'client_key {client_key} is not in pack clients.')
        return self._client[client_key].get(str(filepath))

    def get_text(self, filepath):
        raise NotImplementedError


class FileClient(object):
    """General file client routing to a backend
    (reference file_client.py:132-167)."""

    _backends = {
        'disk': HardDiskBackend,
        'memcached': MemcachedBackend,
        'lmdb': LmdbBackend,
        'pack': PackBackend,
    }

    def __init__(self, backend='disk', **kwargs):
        if backend not in self._backends:
            raise ValueError(
                f'Backend {backend} is not supported. Currently supported '
                f'ones are {list(self._backends.keys())}')
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath, client_key='default'):
        # client_key is used only in lmdb/pack modes
        if self.backend in ('lmdb', 'pack'):
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)

    def get_text(self, filepath):
        return self.client.get_text(filepath)
