"""LMDB dataset creation (reference basicsr/utils/lmdb_util.py:9-196).

The ``lmdb`` package is optional in this environment; importing this
module without it raises only when the functions are actually used.
"""
import sys
from multiprocessing import Pool
from os import path as osp

import cv2


def _require_lmdb():
    try:
        import lmdb
    except ImportError as exc:  # pragma: no cover - env without lmdb
        raise ImportError(
            'Please install lmdb to create/read LMDB datasets.') from exc
    return lmdb


def make_lmdb_from_imgs(data_path, lmdb_path, img_path_list, keys,
                        batch=5000, compress_level=1,
                        multiprocessing_read=False, n_thread=40,
                        map_size=None):
    """Build an .lmdb folder (data.mdb/lock.mdb/meta_info.txt) from a
    list of images; meta lines are ``key.png (h,w,c) compress_level``
    (reference lmdb_util.py:9-130)."""
    assert len(img_path_list) == len(keys), (
        'img_path_list and keys should have the same length, but got '
        f'{len(img_path_list)} and {len(keys)}')
    if not img_path_list:
        raise ValueError('img_path_list is empty — nothing to write '
                         f'into {lmdb_path}')
    if not lmdb_path.endswith('.lmdb'):
        raise ValueError("lmdb_path must end with '.lmdb'.")
    lmdb = _require_lmdb()
    print(f'Create lmdb for {data_path}, save to {lmdb_path}...')
    print(f'Total images: {len(img_path_list)}')
    if osp.exists(lmdb_path):
        print(f'Folder {lmdb_path} already exists. Exit.')
        sys.exit(1)

    dataset, shapes = {}, {}
    if multiprocessing_read:
        print(f'Read images with multiprocessing, #thread: {n_thread} ...')
        errors = []

        def callback(arg):
            key, dataset[key], shapes[key] = arg

        pool = Pool(n_thread)
        for path, key in zip(img_path_list, keys):
            pool.apply_async(read_img_worker,
                             args=(osp.join(data_path, path), key,
                                   compress_level),
                             callback=callback,
                             error_callback=errors.append)
        pool.close()
        pool.join()
        if errors:
            # surface the worker failure instead of a bare KeyError
            # minutes later in the write loop
            raise RuntimeError(
                f'{len(errors)} image(s) failed to read; first error: '
                f'{errors[0]}')
        if len(dataset) != len(keys):
            missing = sorted(set(keys) - set(dataset))[:5]
            raise RuntimeError(
                f'read {len(dataset)}/{len(keys)} images; missing keys '
                f'start with {missing}')
        print(f'Finish reading {len(img_path_list)} images.')

    if map_size is None:
        if multiprocessing_read:
            # the first image's encoded bytes are already in hand
            data_size_per_img = dataset[keys[0]].nbytes
        else:
            _, img_byte, _ = read_img_worker(
                osp.join(data_path, img_path_list[0]), keys[0],
                compress_level)
            data_size_per_img = img_byte.nbytes
        print('Data size per image is: ', data_size_per_img)
        map_size = data_size_per_img * len(img_path_list) * 10

    env = lmdb.open(lmdb_path, map_size=map_size)
    txn = env.begin(write=True)
    try:
        with open(osp.join(lmdb_path, 'meta_info.txt'), 'w') as txt_file:
            for idx, (path, key) in enumerate(zip(img_path_list, keys)):
                key_byte = key.encode('ascii')
                if multiprocessing_read:
                    img_byte = dataset[key]
                    h, w, c = shapes[key]
                else:
                    _, img_byte, img_shape = read_img_worker(
                        osp.join(data_path, path), key, compress_level)
                    h, w, c = img_shape
                txn.put(key_byte, img_byte)
                txt_file.write(
                    f'{key}.png ({h},{w},{c}) {compress_level}\n')
                if idx % batch == 0:
                    txn.commit()
                    txn = env.begin(write=True)
        txn.commit()
    finally:
        env.close()
    print('\nFinish writing lmdb.')


def read_img_worker(path, key, compress_level):
    """Read + PNG-encode one image (reference lmdb_util.py:133-156)."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError(f'cv2 could not read image: {path}')
    if img.ndim == 2:
        h, w = img.shape
        c = 1
    else:
        h, w, c = img.shape
    _, img_byte = cv2.imencode(
        '.png', img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
    return key, img_byte, (h, w, c)


class LmdbMaker:
    """Incremental LMDB writer (reference lmdb_util.py:156-196)."""

    def __init__(self, lmdb_path, map_size=1024**4, batch=5000,
                 compress_level=1):
        lmdb = _require_lmdb()
        if not lmdb_path.endswith('.lmdb'):
            raise ValueError("lmdb_path must end with '.lmdb'.")
        if osp.exists(lmdb_path):
            print(f'Folder {lmdb_path} already exists. Exit.')
            sys.exit(1)
        self.lmdb_path = lmdb_path
        self.batch = batch
        self.compress_level = compress_level
        self.env = lmdb.open(lmdb_path, map_size=map_size)
        self.txn = self.env.begin(write=True)
        self.txt_file = open(osp.join(lmdb_path, 'meta_info.txt'), 'w')
        self.counter = 0

    def put(self, img_byte, key, img_shape):
        self.counter += 1
        self.txn.put(key.encode('ascii'), img_byte)
        h, w, c = img_shape
        self.txt_file.write(
            f'{key}.png ({h},{w},{c}) {self.compress_level}\n')
        if self.counter % self.batch == 0:
            self.txn.commit()
            self.txn = self.env.begin(write=True)

    def close(self):
        self.txn.commit()
        self.env.close()
        self.txt_file.close()
