"""Thread-safety regressions for the threaded data loader: the datasets
are SHARED across worker threads, so __getitem__ must not mutate shared
state and client construction must happen exactly once."""
import threading

import cv2
import numpy as np
import pytest

from mrefsr_tpu.data import build_dataset
from mrefsr_tpu.data.data_util import ensure_file_client, match_point_crop


@pytest.fixture
def vimeo_root(tmp_path):
    rng = np.random.RandomState(0)
    clip = tmp_path / 'sequences' / '00001' / '0266'
    for root, size in ((tmp_path / 'gt', 32), (tmp_path / 'lq', 8)):
        d = root / '00001' / '0266'
        d.mkdir(parents=True)
        for i in range(1, 8):
            img = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f'im{i}.png'), img)
    (tmp_path / 'meta.txt').write_text('00001/0266 7 (32,32,3)\n')
    return tmp_path


def test_vimeo90k_random_reverse_does_not_mutate_shared_state(
        vimeo_root, monkeypatch):
    """Regression: __getitem__ reversed self.neighbor_list IN PLACE —
    with thread workers a concurrent worker iterating the same list
    read a scrambled frame order (silently corrupted temporal data)."""
    opt = {'name': 'v', 'type': 'Vimeo90KDataset', 'phase': 'train',
           'scale': 4, 'gt_size': 32,
           'dataroot_gt': str(vimeo_root / 'gt'),
           'dataroot_lq': str(vimeo_root / 'lq'),
           'meta_info_file': str(vimeo_root / 'meta.txt'),
           'io_backend': {'type': 'disk'}, 'num_frame': 7,
           'random_reverse': True, 'use_hflip': False, 'use_rot': False}
    ds = build_dataset(opt)
    before = list(ds.neighbor_list)
    import mrefsr_tpu.data.vimeo90k_dataset as mod
    monkeypatch.setattr(mod.random, 'random', lambda: 0.0)  # force reverse
    sample = ds[0]
    assert sample['lq'].shape == (7, 8, 8, 3)
    assert list(ds.neighbor_list) == before, \
        'shared neighbor_list mutated by a reversed draw'


def test_io_backend_opt_not_mutated(vimeo_root):
    """Regression: lmdb-mode datasets injected db_paths/client_keys into
    the CALLER's io_backend dict, so a second dataset built from the
    same mapping (YAML anchor) silently opened the first's paths."""
    io_backend = {'type': 'disk'}
    opt = {'name': 'v', 'type': 'Vimeo90KDataset', 'phase': 'train',
           'scale': 4, 'gt_size': 32,
           'dataroot_gt': str(vimeo_root / 'gt'),
           'dataroot_lq': str(vimeo_root / 'lq'),
           'meta_info_file': str(vimeo_root / 'meta.txt'),
           'io_backend': io_backend, 'num_frame': 7,
           'random_reverse': False, 'use_hflip': False, 'use_rot': False}
    ds = build_dataset(opt)
    ds.io_backend_opt['db_paths'] = ['injected']  # what lmdb mode does
    assert io_backend == {'type': 'disk'}, \
        'dataset mutated the shared io_backend mapping'


def test_ensure_file_client_constructs_once(monkeypatch):
    """Regression: the bare lazy-init pattern let every first-batch
    worker thread build (and leak) its own FileClient."""
    import mrefsr_tpu.data.data_util as du

    calls = []

    def slow_factory(opt):
        import time
        calls.append(1)
        time.sleep(0.05)
        return object()

    monkeypatch.setattr(du, 'lazy_file_client', slow_factory)

    class DS:
        file_client = None
        io_backend_opt = {'type': 'disk'}

    ds = DS()
    barrier = threading.Barrier(8)

    def worker():
        barrier.wait()
        ensure_file_client(ds)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1, f'client constructed {len(calls)} times'
    assert ds.file_client is not None


def test_match_point_crop_rejects_undersized_image():
    """Regression: an image smaller than the window silently returned an
    under-sized crop (np.stack crash / gt-lq scale desync downstream)."""
    img = np.zeros((150, 200, 3), np.float32)
    with pytest.raises(ValueError, match='smaller than the crop'):
        match_point_crop(img, (100, 75), 160, 160)
    # boundary-clamped interior crop still works
    out = match_point_crop(img, (5, 5), 100, 100)
    assert out.shape == (100, 100, 3)


def test_read_img_worker_raises_on_unreadable(tmp_path):
    """Regression: cv2.imread's None return crashed with a bare
    AttributeError partway through an LMDB build."""
    from mrefsr_tpu.utils.lmdb_util import (make_lmdb_from_imgs,
                                            read_img_worker)
    bad = tmp_path / 'bad.png'
    bad.write_text('not an image')
    with pytest.raises(IOError, match='could not read'):
        read_img_worker(str(bad), 'k', 1)
    # input validation fires before the optional lmdb import
    with pytest.raises(ValueError, match='empty'):
        make_lmdb_from_imgs(str(tmp_path), str(tmp_path / 'x.lmdb'),
                            [], [])


def test_file_client_path_normalization(tmp_path):
    """Regression: LmdbBackend silently AttributeError'd on pathlib.Path
    / tuple db_paths; the keyed backends now share one normalizer."""
    from pathlib import Path

    from mrefsr_tpu.utils.file_client import _normalize_paths
    paths, keys = _normalize_paths(Path('/a/b.lmdb'), 'gt', 'test')
    assert paths == ['/a/b.lmdb'] and keys == ['gt']
    paths, keys = _normalize_paths(('/a', '/b'), ['x', 'y'], 'test')
    assert paths == ['/a', '/b']
    with pytest.raises(ValueError, match='same length'):
        _normalize_paths(['/a'], ['x', 'y'], 'test')
