"""IO backends (disk / LMDB / memcached) behind a FileClient facade.

Rebuild of reference basicsr/utils/file_client.py:22-167. LMDB and
memcached imports are gated since neither is guaranteed in the TPU image.
"""
from abc import ABCMeta, abstractmethod


class BaseStorageBackend(metaclass=ABCMeta):
    """Abstract storage backend: ``get`` bytes, ``get_text`` str."""

    @abstractmethod
    def get(self, filepath):
        pass

    @abstractmethod
    def get_text(self, filepath):
        pass


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
        self._mc_buffer = mc.pyvector()

    def get(self, filepath):
        import mc
        filepath = str(filepath)
        self._client.Get(filepath, self._mc_buffer)
        return mc.ConvertBuffer(self._mc_buffer)

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

        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, list):
            self.db_paths = [str(v) for v in db_paths]
        elif isinstance(db_paths, str):
            self.db_paths = [str(db_paths)]
        assert len(client_keys) == len(self.db_paths), (
            'client_keys and db_paths should have the same length, '
            f'but received {len(client_keys)} and {len(self.db_paths)}.')

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
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, str):
            db_paths = [db_paths]
        db_paths = [str(v) for v in db_paths]
        assert len(client_keys) == len(db_paths), (
            'client_keys and db_paths should have the same length, but '
            f'received {len(client_keys)} and {len(db_paths)}.')
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
