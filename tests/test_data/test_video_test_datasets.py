"""Unit tests for the remaining video test-set datasets
(VideoTestVimeo90KDataset, VideoTestDUFDataset, and the cache_data
path of VideoTestDataset) — the reference ships no tests for any of
them (reference video_test_dataset.py:133-252)."""
import cv2
import numpy as np
import pytest

from mrefsr_tpu.data import build_dataset

SCALE = 4
LQ = 8
GT = LQ * SCALE
NFRAMES = 6  # frames per clip


@pytest.fixture(scope='module')
def vid4_root(tmp_path_factory):
    """Two short clips in Vid4 folder layout (gt/<clip>/*.png)."""
    root = tmp_path_factory.mktemp('vid4')
    rng = np.random.RandomState(0)
    for clip in ('calendar', 'city'):
        (root / 'gt' / clip).mkdir(parents=True)
        (root / 'lq' / clip).mkdir(parents=True)
        for i in range(NFRAMES):
            gt = (rng.rand(GT, GT, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(root / 'gt' / clip / f'{i:08d}.png'), gt)
            lq = cv2.resize(gt, (LQ, LQ), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(str(root / 'lq' / clip / f'{i:08d}.png'), lq)
    return root


@pytest.fixture(scope='module')
def vimeo_root(tmp_path_factory):
    """Vimeo90K-Test layout: <root>/<scene>/<clip>/im1..im7.png."""
    root = tmp_path_factory.mktemp('vimeo_test')
    rng = np.random.RandomState(1)
    for scene in ('00001/0001', '00001/0002'):
        (root / 'gt' / scene).mkdir(parents=True)
        (root / 'lq' / scene).mkdir(parents=True)
        for i in range(1, 8):
            gt = (rng.rand(GT, GT, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(root / 'gt' / scene / f'im{i}.png'), gt)
            lq = cv2.resize(gt, (LQ, LQ), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(str(root / 'lq' / scene / f'im{i}.png'), lq)
    meta = root / 'meta_info.txt'
    meta.write_text(f'00001/0001 7 ({GT},{GT},3)\n'
                    f'00001/0002 7 ({GT},{GT},3)\n')
    return root


def _vid4_opt(root, **extra):
    opt = {
        'name': 'Vid4', 'type': 'VideoTestDataset', 'phase': 'val',
        'scale': SCALE, 'cache_data': False,
        'dataroot_gt': str(root / 'gt'), 'dataroot_lq': str(root / 'lq'),
        'io_backend': {'type': 'disk'},
        'num_frame': 3, 'padding': 'reflection',
    }
    opt.update(extra)
    return opt


def test_video_test_dataset_cache_data(vid4_root):
    """cache_data=True preloads clips; items must match the lazy path."""
    lazy = build_dataset(_vid4_opt(vid4_root))
    cached = build_dataset(_vid4_opt(vid4_root, cache_data=True))
    assert len(lazy) == len(cached) == 2 * NFRAMES
    for index in (0, 4, NFRAMES - 1):
        a, b = lazy[index], cached[index]
        np.testing.assert_allclose(np.asarray(a['lq']),
                                   np.asarray(b['lq']), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a['gt']),
                                   np.asarray(b['gt']), atol=1e-6)
        assert a['folder'] == b['folder'] and a['idx'] == b['idx']
    # first/last num_frame//2 frames of each clip are border frames
    borders = lazy.data_info['border'][:NFRAMES]
    assert borders == [1] + [0] * (NFRAMES - 2) + [1]


def test_video_test_vimeo90k_dataset(vimeo_root):
    """Center frame im4 is GT; the full 7-frame window is LQ
    (reference video_test_dataset.py:133-199)."""
    ds = build_dataset({
        'name': 'Vimeo90K', 'type': 'VideoTestVimeo90KDataset',
        'phase': 'val', 'scale': SCALE, 'cache_data': False,
        'dataroot_gt': str(vimeo_root / 'gt'),
        'dataroot_lq': str(vimeo_root / 'lq'),
        'meta_info_file': str(vimeo_root / 'meta_info.txt'),
        'io_backend': {'type': 'disk'}, 'num_frame': 7,
    })
    assert len(ds) == 2
    item = ds[0]
    assert item['lq'].shape == (7, LQ, LQ, 3)
    assert item['gt'].shape == (GT, GT, 3)
    assert item['folder'] == 'vimeo90k'
    assert item['idx'] == '0/2'
    assert item['lq_path'].endswith('im4.png')
    # gt must be the center frame's GT image (im4), RGB float
    gt4 = cv2.imread(
        str(vimeo_root / 'gt' / '00001/0001' / 'im4.png')).astype(
            np.float32) / 255.
    np.testing.assert_allclose(np.asarray(item['gt']), gt4[..., ::-1],
                               atol=1e-6)


def test_video_test_vimeo90k_smaller_window(vimeo_root):
    """num_frame=5 selects im2..im6 centered on im4
    (neighbor_list = i + (9 - num_frame)//2)."""
    ds = build_dataset({
        'name': 'Vimeo90K', 'type': 'VideoTestVimeo90KDataset',
        'phase': 'val', 'scale': SCALE, 'cache_data': False,
        'dataroot_gt': str(vimeo_root / 'gt'),
        'dataroot_lq': str(vimeo_root / 'lq'),
        'meta_info_file': str(vimeo_root / 'meta_info.txt'),
        'io_backend': {'type': 'disk'}, 'num_frame': 5,
    })
    item = ds[1]
    assert item['lq'].shape == (5, LQ, LQ, 3)
    assert item['lq_path'].endswith('im4.png')
    lq2 = cv2.imread(
        str(vimeo_root / 'lq' / '00001/0002' / 'im2.png')).astype(
            np.float32) / 255.
    np.testing.assert_allclose(np.asarray(item['lq'][0]), lq2[..., ::-1],
                               atol=1e-6)


def test_video_test_duf_dataset_synthesized_lq(vid4_root):
    """use_duf_downsampling derives LQ from GT via Gaussian-blur
    subsampling (reference video_test_dataset.py:202-252)."""
    ds = build_dataset(_vid4_opt(
        vid4_root, type='VideoTestDUFDataset',
        use_duf_downsampling=True))
    item = ds[2]
    assert item['lq'].shape == (3, GT // SCALE, GT // SCALE, 3)
    assert item['gt'].shape == (GT, GT, 3)
    # reference parity: duf_downsample of the cached-GT path must agree
    cached = build_dataset(_vid4_opt(
        vid4_root, type='VideoTestDUFDataset', cache_data=True,
        use_duf_downsampling=True))
    np.testing.assert_allclose(np.asarray(item['lq']),
                               np.asarray(cached[2]['lq']), atol=1e-5)


def test_video_test_duf_dataset_real_lq(vid4_root):
    """use_duf_downsampling=False reads the LQ folder directly."""
    ds = build_dataset(_vid4_opt(
        vid4_root, type='VideoTestDUFDataset',
        use_duf_downsampling=False))
    item = ds[0]
    assert item['lq'].shape == (3, LQ, LQ, 3)
    lq0 = cv2.imread(
        str(vid4_root / 'lq' / 'calendar' / '00000000.png')).astype(
            np.float32) / 255.
    # index 0 with reflection padding selects frames [1, 0, 1]
    np.testing.assert_allclose(np.asarray(item['lq'][1]), lq0[..., ::-1],
                               atol=1e-6)
