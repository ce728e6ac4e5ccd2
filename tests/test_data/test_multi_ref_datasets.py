"""Unit tests for the flagship LMR/CUFED5 dataset classes, the
EnlargedSampler, and the shared transforms — coverage the reference
ships none of (SURVEY §4: MRefSR datasets untested upstream)."""
import os.path as osp

import cv2
import numpy as np
import pytest

from mrefsr_tpu.data import build_dataset
from mrefsr_tpu.data.data_sampler import EnlargedSampler
from mrefsr_tpu.data.transforms import augment, mod_crop, \
    paired_random_crop


@pytest.fixture
def lmr_root(tmp_path):
    """One LMR scene: target + 5 refs with match points, CSV annotation
    in the reference's column layout (multi_ref_dataset.py:46-66)."""
    scene = tmp_path / 'scenes' / '0001'
    scene.mkdir(parents=True)
    rng = np.random.RandomState(0)
    names = ['t.png', 'h.png', 'm1.png', 'm2.png', 'l1.png', 'l2.png']
    for n in names:
        img = rng.randint(0, 255, (80, 96, 3), dtype=np.uint8)
        cv2.imwrite(str(scene / n), img)
    csv = tmp_path / 'ann.csv'
    pts = '"[48, 40]"'  # (x, y) center with room for a 32-crop
    csv.write_text(
        'target,h,m1,m2,l1,l2,p0,p1,p2,p3,p4,p5,scene\n'
        f't.png,h.png,m1.png,m2.png,l1.png,l2.png,'
        f'{pts},{pts},{pts},{pts},{pts},{pts},0001\n')
    return str(tmp_path / 'scenes'), str(csv)


def test_multi_ref_megadepth_dataset(lmr_root):
    root, ann = lmr_root
    opt = {'name': 'lmr', 'type': 'MultiRefMegaDepthDataset',
           'phase': 'train', 'scale': 4, 'gt_size': 32,
           'dataroot_in': root, 'dataroot_ref': root, 'ann_file': ann,
           'use_flip': False, 'use_rot': False}
    ds = build_dataset(opt)
    assert len(ds) == 1
    item = ds[0]
    assert item['img_in'].shape == (32, 32, 3)
    assert item['img_in_lq'].shape == (8, 8, 3)
    assert item['img_in_up'].shape == (32, 32, 3)
    assert item['img_ref_list'].shape == (5, 32, 32, 3)
    assert item['img_ref_lq_list'].shape == (5, 8, 8, 3)
    assert item['img_ref_up_list'].shape == (5, 32, 32, 3)
    assert item['img_in'].dtype == np.float32
    assert 0.0 <= item['img_in'].min() and item['img_in'].max() <= 1.0

    # crop is centered on the annotated (x=48, y=40) match point
    from PIL import Image
    target = np.array(
        Image.open(osp.join(root, '0001', 't.png')).convert(
            'RGB')).astype(np.float32) / 255.
    np.testing.assert_array_equal(item['img_in'],
                                  target[40 - 16:40 + 16, 48 - 16:48 + 16])

    # the 5 refs are the annotated crops, in shuffled order
    ref_imgs = set()
    for n in ('h.png', 'm1.png', 'm2.png', 'l1.png', 'l2.png'):
        img = np.array(Image.open(osp.join(root, '0001', n)).convert(
            'RGB')).astype(np.float32) / 255.
        ref_imgs.add(img[40 - 16:40 + 16, 48 - 16:48 + 16].tobytes())
    got = {item['img_ref_list'][i].tobytes() for i in range(5)}
    assert got == ref_imgs


def test_multi_ref_megadepth_decode_cache_identical(lmr_root):
    """decode_cache_size changes only WHERE decode happens, never the
    sample values — cached and uncached datasets agree bit-exactly under
    the same augmentation RNG state."""
    import random
    root, ann = lmr_root
    opt = {'name': 'lmr', 'type': 'MultiRefMegaDepthDataset',
           'phase': 'train', 'scale': 4, 'gt_size': 32,
           'dataroot_in': root, 'dataroot_ref': root, 'ann_file': ann,
           'use_flip': True, 'use_rot': True}
    ds_plain = build_dataset(opt)
    ds_cache = build_dataset(dict(opt, decode_cache_size=16))
    _ = ds_cache[0]  # populate the cache so the second read hits it
    random.seed(123)
    a = ds_plain[0]
    random.seed(123)
    b = ds_cache[0]
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_multi_ref_megadepth_uint8_output_exact(lmr_root):
    """output_dtype: uint8 ships the same sample values as the float
    pipeline: u8/255 is exact in f32, so dividing the uint8 sample by
    255 reproduces the f32 sample bit-for-bit (the device-side /255.
    in BackgroundDevicePrefetcher is this same formula)."""
    import random
    root, ann = lmr_root
    opt = {'name': 'lmr', 'type': 'MultiRefMegaDepthDataset',
           'phase': 'train', 'scale': 4, 'gt_size': 32,
           'dataroot_in': root, 'dataroot_ref': root, 'ann_file': ann,
           'use_flip': True, 'use_rot': True}
    ds_f32 = build_dataset(opt)
    ds_u8 = build_dataset(dict(opt, output_dtype='uint8'))
    random.seed(7)
    a = ds_f32[0]
    random.seed(7)
    b = ds_u8[0]
    for k in a:
        assert b[k].dtype == np.uint8, k
        np.testing.assert_array_equal(
            a[k], b[k].astype(np.float32) / 255., err_msg=k)


@pytest.fixture
def cufed_root(tmp_path):
    rng = np.random.RandomState(1)
    for g in range(2):
        # input deliberately NOT a multiple of scale -> mod_crop path
        img = rng.randint(0, 255, (122, 87, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / f'{g:03d}_0.png'), img)
        for r in range(1, 6):
            ref = rng.randint(0, 255, (140, 150, 3), dtype=np.uint8)
            cv2.imwrite(str(tmp_path / f'{g:03d}_{r}.png'), ref)
    return str(tmp_path)


def test_multi_ref_cufed_set(cufed_root):
    opt = {'name': 'cufed5', 'type': 'MultiRefCUFEDSet', 'phase': 'val',
           'scale': 4, 'dataroot_in': cufed_root,
           'dataroot_ref': cufed_root}
    ds = build_dataset(opt)
    assert len(ds) == 2
    item = ds[0]
    # mod-crop of 122x87 at x4 -> 120x84, then padded to the static
    # 500x500 canvas with the original size carried for un-padding
    assert item['original_size'] == (120, 84)
    assert item['padding'] is True
    assert item['img_in'].shape == (120, 84, 3)          # unpadded gt
    assert item['img_in_lq'].shape == (125, 125, 3)      # 500/4
    assert item['img_in_up'].shape == (500, 500, 3)
    assert item['img_ref_list'].shape == (5, 500, 500, 3)
    # pad region is zeros
    assert item['img_in_up'][:, 490:].max() == 0
    # BGR file -> RGB tensor: compare channel-reversed pixels
    raw = cv2.imread(osp.join(cufed_root, '000_0.png'))[:120, :84]
    np.testing.assert_allclose(item['img_in'],
                               raw[..., ::-1].astype(np.float32) / 255.)


def test_multi_ref_cufed_set_bucketed_pad(cufed_root):
    """pad_to as a list picks, per DIMENSION, the smallest bucket the
    mod-cropped input fits (rectangular canvases); over-sized refs crop
    to the same canvas."""
    opt = {'name': 'cufed5', 'type': 'MultiRefCUFEDSet', 'phase': 'val',
           'scale': 4, 'dataroot_in': cufed_root,
           'dataroot_ref': cufed_root, 'pad_to': [128, 300, 500]}
    ds = build_dataset(opt)
    item = ds[0]
    # input 120x84 fits the 128 bucket in both dims; refs (140x150)
    # crop to 128
    assert item['original_size'] == (120, 84)
    assert item['img_in_lq'].shape == (32, 32, 3)        # 128/4
    assert item['img_in_up'].shape == (128, 128, 3)
    assert item['img_ref_list'].shape == (5, 128, 128, 3)
    # un-padded gt is canvas-independent
    assert item['img_in'].shape == (120, 84, 3)

    # rectangular selection: h=120 -> 128 bucket, w=84 -> 96 bucket
    ds = build_dataset(dict(opt, pad_to=[96, 128, 300, 500]))
    item = ds[0]
    assert item['original_size'] == (120, 84)
    assert item['img_in_up'].shape == (128, 96, 3)
    assert item['img_in_lq'].shape == (32, 24, 3)        # canvas/4
    assert item['img_ref_list'].shape == (5, 128, 96, 3)
    assert item['img_in'].shape == (120, 84, 3)

    with pytest.raises(ValueError):
        build_dataset(dict(opt, pad_to=[130]))  # not divisible by scale


def test_enlarged_sampler_sharding_and_epoch_seed():
    ds = list(range(10))
    s0 = EnlargedSampler(ds, num_replicas=2, rank=0, ratio=2)
    s1 = EnlargedSampler(ds, num_replicas=2, rank=1, ratio=2)
    assert len(s0) == len(s1) == 10  # 10 * 2 / 2

    s0.set_epoch(3)
    s1.set_epoch(3)
    i0, i1 = list(s0), list(s1)
    # ranks take strided disjoint positions of the same permutation
    assert len(i0) == len(i1) == 10
    assert all(0 <= v < 10 for v in i0 + i1)
    # every dataset index appears across the union (enlarge ratio 2
    # maps the doubled index space back onto the dataset)
    assert set(i0) | set(i1) == set(range(10))

    # deterministic per epoch, different across epochs
    s0.set_epoch(3)
    assert list(s0) == i0
    s0.set_epoch(4)
    assert list(s0) != i0


def test_paired_random_crop_alignment():
    rng = np.random.RandomState(2)
    gt = rng.rand(40, 48, 3).astype(np.float32)
    lq = gt[::4, ::4]  # exact decimation so alignment is checkable
    gt_c, lq_c = paired_random_crop(gt, lq, gt_patch_size=16, scale=4)
    assert gt_c.shape == (16, 16, 3)
    assert lq_c.shape == (4, 4, 3)
    np.testing.assert_array_equal(gt_c[::4, ::4], lq_c)


def test_augment_flip_rot():
    import random as pyrandom
    img = np.arange(24, dtype=np.float32).reshape(2, 4, 3)
    pyrandom.seed(0)
    out, status = augment([img], hflip=True, rotation=True,
                          return_status=True)  # 1-list unwraps
    hflip, vflip, rot90 = status
    want = img
    if hflip:
        want = want[:, ::-1]
    if vflip:
        want = want[::-1]
    if rot90:
        want = want.transpose(1, 0, 2)
    np.testing.assert_array_equal(out, want)


def test_mod_crop():
    img = np.zeros((11, 14, 3))
    assert mod_crop(img, 4).shape == (8, 12, 3)


def test_single_image_dataset(tmp_path):
    rng = np.random.RandomState(6)
    for i in range(3):
        cv2.imwrite(str(tmp_path / f'{i}.png'),
                    rng.randint(0, 255, (20, 24, 3), dtype=np.uint8))
    ds = build_dataset({'name': 's', 'type': 'SingleImageDataset',
                        'phase': 'test', 'scale': 1,
                        'dataroot_lq': str(tmp_path),
                        'io_backend': {'type': 'disk'}})
    assert len(ds) == 3
    item = ds[0]
    assert item['lq'].shape == (20, 24, 3)
    assert item['lq_path'].endswith('0.png')


def test_vimeo90k_dataset(tmp_path):
    rng = np.random.RandomState(7)
    for root, size in (('gt', (64, 112)), ('lq', (16, 28))):
        seq = tmp_path / root / '00001' / '0266'
        seq.mkdir(parents=True)
        for f in range(1, 8):
            cv2.imwrite(str(seq / f'im{f}.png'),
                        rng.randint(0, 255, (*size, 3), dtype=np.uint8))
    meta = tmp_path / 'meta.txt'
    meta.write_text('00001/0266 (64,112,3)\n')
    ds = build_dataset({
        'name': 'v', 'type': 'Vimeo90KDataset', 'phase': 'train',
        'scale': 4, 'gt_size': 32, 'num_frame': 7,
        'dataroot_gt': str(tmp_path / 'gt'),
        'dataroot_lq': str(tmp_path / 'lq'),
        'meta_info_file': str(meta), 'io_backend': {'type': 'disk'},
        'use_hflip': False, 'use_rot': False, 'random_reverse': False})
    assert len(ds) == 1
    item = ds[0]
    # GT is the center frame (im4), LQ the full septuplet
    assert item['gt'].shape == (32, 32, 3)
    assert item['lq'].shape == (7, 8, 8, 3)
    assert item['key'] == '00001/0266'


def test_loader_propagates_worker_exception():
    """Regression: a dataset exception inside the producer thread used
    to kill it before the end-sentinel, hanging the train loop forever;
    it must re-raise in the consumer."""
    from mrefsr_tpu.data.loader import DataLoader

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError('corrupt image')
            return {'x': np.zeros((2, 2), np.float32)}

    loader = DataLoader(Bad(), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match='corrupt image'):
        for _ in loader:
            pass


def test_match_point_crop_clamps_at_borders():
    """Edge match points produce a full-size clamped crop instead of
    the reference's silent numpy wrap-around slice."""
    from mrefsr_tpu.data.data_util import match_point_crop
    img = np.arange(40 * 60 * 3, dtype=np.float32).reshape(40, 60, 3)
    # interior point: identical to the raw slice
    np.testing.assert_array_equal(
        match_point_crop(img, (30, 20), 16, 16),
        img[20 - 8:20 + 8, 30 - 8:30 + 8])
    # point near the top-left border: clamped, full size, no wrap
    crop = match_point_crop(img, (3, 2), 16, 16)
    assert crop.shape == (16, 16, 3)
    np.testing.assert_array_equal(crop, img[0:16, 0:16])
    # near bottom-right
    crop = match_point_crop(img, (59, 39), 16, 16)
    np.testing.assert_array_equal(crop, img[24:40, 44:60])
