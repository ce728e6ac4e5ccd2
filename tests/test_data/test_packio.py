"""Native packio shard round-trip + FileClient 'pack' backend +
PairedImageDataset over pack shards."""
import os.path as osp

import cv2
import numpy as np
import pytest

from mrefsr_tpu.data.packio import PackReader, PackWriter
from mrefsr_tpu.utils import FileClient


def test_pack_roundtrip(tmp_path):
    path = str(tmp_path / 'toy.pack')
    writer = PackWriter(path)
    blobs = {f'k{i:03d}': bytes(np.random.RandomState(i).bytes(100 + i))
             for i in range(20)}
    for k, v in blobs.items():
        writer.put(k, v)
    writer.close()

    reader = PackReader(path)
    assert len(reader) == 20
    assert sorted(reader.keys()) == sorted(blobs)
    for k, v in blobs.items():
        assert reader.get(k) == v
    with pytest.raises(KeyError):
        reader.get('missing')
    reader.close()


def test_fileclient_pack_backend(tmp_path):
    rng = np.random.RandomState(0)
    imgs = {}
    for split in ('lq', 'gt'):
        path = str(tmp_path / f'{split}.pack')
        writer = PackWriter(path)
        for name in ('a', 'b'):
            img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
            ok, buf = cv2.imencode('.png', img)
            writer.put(name, buf.tobytes(), shape=img.shape)
            imgs[(split, name)] = img
        writer.close()
        assert osp.exists(f'{path}.meta_info.txt')

    client = FileClient('pack',
                        db_paths=[str(tmp_path / 'lq.pack'),
                                  str(tmp_path / 'gt.pack')],
                        client_keys=['lq', 'gt'])
    for (split, name), img in imgs.items():
        data = client.get(name, split)
        decoded = cv2.imdecode(np.frombuffer(data, np.uint8),
                               cv2.IMREAD_COLOR)
        np.testing.assert_array_equal(decoded, img)


def test_paired_image_dataset_over_pack(tmp_path):
    """io_backend: {type: pack} is a drop-in for lmdb: dataroot_* point
    at the .pack shards and paired keys come from the shard indexes."""
    rng = np.random.RandomState(1)
    for split, size in (('lq', 8), ('gt', 32)):
        writer = PackWriter(str(tmp_path / f'{split}.pack'))
        for name in ('a', 'b', 'c'):
            img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
            ok, buf = cv2.imencode('.png', img)
            writer.put(name, buf.tobytes(), shape=img.shape)
        writer.close()

    from mrefsr_tpu.data import build_dataset
    opt = {'name': 'p', 'type': 'PairedImageDataset', 'phase': 'train',
           'scale': 4, 'gt_size': 32,
           'dataroot_gt': str(tmp_path / 'gt.pack'),
           'dataroot_lq': str(tmp_path / 'lq.pack'),
           'io_backend': {'type': 'pack'},
           'use_hflip': False, 'use_rot': False}
    ds = build_dataset(opt)
    assert len(ds) == 3
    s = ds[0]
    assert s['gt'].shape == (32, 32, 3)
    assert s['lq'].shape == (8, 8, 3)
