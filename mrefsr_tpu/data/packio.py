"""ctypes bindings for the native packio shard IO (native/packio.cpp).

Packed shards are the framework's TPU-native dataset container: one
immutable mmap'ed file per dataset, zero-copy reads from the page cache
(replaces the reference's LMDB backend, file_client.py:74-111). The
shared library is built on demand with ``make -C native`` (g++ only, no
pybind11).
"""
import ctypes
import os
import os.path as osp
import subprocess
import threading

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), 'native')
_LIB_PATH = osp.join(_NATIVE_DIR, 'libpackio.so')
_lock = threading.Lock()
_lib = None


def _load_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not osp.exists(_LIB_PATH):
            subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.packio_create.restype = ctypes.c_void_p
        lib.packio_create.argtypes = [ctypes.c_char_p]
        lib.packio_add.restype = ctypes.c_int
        lib.packio_add.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_char_p, ctypes.c_uint64]
        lib.packio_finish.restype = ctypes.c_int
        lib.packio_finish.argtypes = [ctypes.c_void_p]
        lib.packio_open.restype = ctypes.c_void_p
        lib.packio_open.argtypes = [ctypes.c_char_p]
        lib.packio_count.restype = ctypes.c_uint64
        lib.packio_count.argtypes = [ctypes.c_void_p]
        lib.packio_get.restype = ctypes.POINTER(ctypes.c_ubyte)
        lib.packio_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_uint64)]
        lib.packio_keys.restype = ctypes.c_uint64
        lib.packio_keys.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_uint64]
        lib.packio_close.restype = None
        lib.packio_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


class PackWriter:
    """Build a .pack shard: ``put(key, bytes)`` then ``close()``. Also
    writes an LMDB-style ``<path>.meta_info.txt`` alongside when image
    shapes are provided."""

    def __init__(self, path):
        self._lib = _load_lib()
        self._handle = self._lib.packio_create(path.encode())
        if not self._handle:
            raise IOError(f'cannot create pack shard at {path}')
        self.path = path
        self._meta = []

    def put(self, key, data, shape=None, compress_level=1):
        rc = self._lib.packio_add(self._handle, key.encode(),
                                  bytes(data), len(data))
        if rc != 0:
            raise IOError(f'packio_add failed for key {key}')
        if shape is not None:
            h, w, c = shape
            self._meta.append(f'{key}.png ({h},{w},{c}) {compress_level}')

    def close(self):
        rc = self._lib.packio_finish(self._handle)
        self._handle = None
        if rc != 0:
            raise IOError('packio_finish failed')
        if self._meta:
            with open(f'{self.path}.meta_info.txt', 'w') as f:
                f.write('\n'.join(self._meta) + '\n')


class PackReader:
    """Zero-copy reader over an immutable .pack shard."""

    def __init__(self, path):
        self._lib = _load_lib()
        self._handle = self._lib.packio_open(path.encode())
        if not self._handle:
            raise IOError(f'cannot open pack shard at {path}')

    def __len__(self):
        return self._lib.packio_count(self._handle)

    def keys(self):
        need = self._lib.packio_keys(self._handle, None, 0)
        buf = ctypes.create_string_buffer(int(need))
        self._lib.packio_keys(self._handle, buf, need)
        return buf.raw[:int(need)].decode().splitlines()

    def get(self, key):
        length = ctypes.c_uint64()
        ptr = self._lib.packio_get(self._handle, key.encode(),
                                   ctypes.byref(length))
        if not ptr:
            raise KeyError(key)
        return ctypes.string_at(ptr, length.value)

    def close(self):
        if self._handle:
            self._lib.packio_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
