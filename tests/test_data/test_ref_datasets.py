"""Ref/SISR dataset tests over synthetic fixtures (CSV annotations and
folder layouts mirroring MegaDepth-LMR / CUFED)."""
import os.path as osp

import cv2
import numpy as np
import pytest

from mrefsr_tpu.data import build_dataset

IMG = 96
GT = 32
SCALE = 4


@pytest.fixture(scope='module')
def megadepth_root(tmp_path_factory):
    """LMR-style CSV: target,H,M1,M2,L1,L2,p0..p5,scene."""
    root = tmp_path_factory.mktemp('lmr')
    scene = '0001'
    (root / 'imgs' / scene).mkdir(parents=True)
    rng = np.random.RandomState(0)
    names = [f'im{i}.jpg' for i in range(6)]
    for name in names:
        cv2.imwrite(str(root / 'imgs' / scene / name),
                    (rng.rand(IMG, IMG, 3) * 255).astype(np.uint8))
    pt = str((IMG // 2, IMG // 2))
    rows = ['target,H,M1,M2,L1,L2,p0,p1,p2,p3,p4,p5,scene']
    for _ in range(3):
        rows.append(','.join(names) + ',' + ','.join([f'"{pt}"'] * 6)
                    + f',{scene}')
    (root / 'ann.csv').write_text('\n'.join(rows) + '\n')
    return root


@pytest.fixture(scope='module')
def ref_megadepth_root(tmp_path_factory):
    """RefMegaDepth CSV: target,reference,scene,sim,pA,pB."""
    root = tmp_path_factory.mktemp('refmd')
    rng = np.random.RandomState(1)
    for scene in ('0001', '0000'):  # 0000 is a test scene
        (root / 'imgs' / scene).mkdir(parents=True)
        for name in ('a.jpg', 'b.jpg'):
            cv2.imwrite(str(root / 'imgs' / scene / name),
                        (rng.rand(IMG, IMG, 3) * 255).astype(np.uint8))
    pts = str([(IMG // 2, IMG // 2), (IMG // 2, IMG // 2)])
    rows = ['target,reference,scene,sim,pA,pB']
    for scene in ('0001', '0000'):
        rows.append(f'a.jpg,b.jpg,{scene},H,"{pts}","{pts}"')
    (root / 'ann.csv').write_text('\n'.join(rows) + '\n')
    return root


@pytest.fixture(scope='module')
def cufed_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('cufed')
    (root / 'input').mkdir()
    (root / 'ref').mkdir()
    rng = np.random.RandomState(2)
    for name in ('x', 'y'):
        cv2.imwrite(str(root / 'input' / f'{name}.png'),
                    (rng.rand(IMG, IMG, 3) * 255).astype(np.uint8))
        cv2.imwrite(str(root / 'ref' / f'{name}.png'),
                    (rng.rand(IMG - 8, IMG, 3) * 255).astype(np.uint8))
    return root


def test_sisr_megadepth_dataset(megadepth_root):
    opt = {'name': 't', 'type': 'SISRMegaDepthDataset', 'phase': 'train',
           'scale': SCALE, 'gt_size': GT, 'use_flip': True,
           'use_rot': True,
           'dataroot_in': str(megadepth_root / 'imgs'),
           'dataroot_ref': str(megadepth_root / 'imgs'),
           'ann_file': str(megadepth_root / 'ann.csv')}
    ds = build_dataset(opt)
    assert len(ds) == 3
    s = ds[0]
    assert s['gt'].shape == (GT, GT, 3)
    assert s['lq'].shape == (GT // SCALE, GT // SCALE, 3)


def test_single_ref_megadepth_dataset(megadepth_root):
    opt = {'name': 't', 'type': 'SingleRefMegaDepthDataset',
           'phase': 'train', 'scale': SCALE, 'gt_size': GT,
           'use_flip': False, 'use_rot': False,
           'dataroot_in': str(megadepth_root / 'imgs'),
           'dataroot_ref': str(megadepth_root / 'imgs'),
           'ann_file': str(megadepth_root / 'ann.csv')}
    ds = build_dataset(opt)
    s = ds[0]
    for k, shape in (('img_in', (GT, GT, 3)),
                     ('img_in_lq', (GT // SCALE, GT // SCALE, 3)),
                     ('img_in_up', (GT, GT, 3)),
                     ('img_ref', (GT, GT, 3)),
                     ('img_ref_lq', (GT // SCALE, GT // SCALE, 3)),
                     ('img_ref_up', (GT, GT, 3))):
        assert s[k].shape == shape, (k, s[k].shape)


def test_ref_megadepth_dataset_split(ref_megadepth_root):
    base = {'name': 't', 'scale': SCALE, 'gt_size': GT,
            'use_flip': False, 'use_rot': False,
            'dataroot_in': str(ref_megadepth_root / 'imgs'),
            'dataroot_ref': str(ref_megadepth_root / 'imgs'),
            'ann_file': str(ref_megadepth_root / 'ann.csv')}
    train = build_dataset(
        dict(base, type='RefMegaDepthDataset', phase='train'))
    # train excludes test scene 0000; 2 match points in scene 0001
    assert len(train) == 2
    s = train[0]
    assert s['img_in'].shape == (GT, GT, 3)
    test = build_dataset(
        dict(base, type='RefMegaDepthDataset', phase='val'))
    assert len(test) == 1
    s = test[0]
    assert 'padding' in s and 'original_size' in s


def test_ref_megadepth_cvt_dataset(ref_megadepth_root):
    opt = {'name': 't', 'type': 'RefMegaDepthCVTDataset', 'phase': 'train',
           'scale': SCALE, 'gt_size': GT, 'use_flip': False,
           'use_rot': False,
           'dataroot_in': str(ref_megadepth_root / 'imgs'),
           'dataroot_ref': str(ref_megadepth_root / 'imgs'),
           'ann_file': str(ref_megadepth_root / 'ann.csv')}
    ds = build_dataset(opt)
    s = ds[0]
    assert s['img_ref_hrp'].shape == (GT, GT, 3)
    assert s['img_ref_hrp_lq'].shape == (GT // SCALE, GT // SCALE, 3)
    assert s['img_ref_hrp_up'].shape == (GT, GT, 3)


def test_ref_cufed_dataset(cufed_root):
    base = {'name': 't', 'scale': SCALE, 'gt_size': GT,
            'use_flip': True, 'use_rot': True,
            'io_backend': {'type': 'disk'},
            'dataroot_in': str(cufed_root / 'input'),
            'dataroot_ref': str(cufed_root / 'ref')}
    train = build_dataset(
        dict(base, type='RefCUFEDDataset', phase='train'))
    s = train[0]
    assert s['img_in'].shape == (IMG, IMG, 3)  # full input, ref resized
    assert s['img_ref'].shape == (GT, GT, 3)

    test = build_dataset(dict(base, type='RefCUFEDDataset', phase='val'))
    s = test[0]
    # input/ref zero-padded to common size for static shapes
    assert s['img_in'].shape[2] == 3
    assert s['padding'] in (True, False)
    assert s['img_ref'].shape == s['img_in_up'].shape

    cvt = build_dataset(
        dict(base, type='RefCUFEDCVTDataset', phase='train'))
    s = cvt[0]
    assert s['img_ref_hrp'].shape == (160, 160, 3)


def test_sisr_cufed_dataset_val(cufed_root):
    opt = {'name': 't', 'type': 'SISRCUFEDDataset', 'phase': 'val',
           'scale': SCALE, 'use_flip': False, 'use_rot': False,
           'io_backend': {'type': 'disk'},
           'dataroot_in': str(cufed_root / 'input'),
           'dataroot_ref': str(cufed_root / 'ref')}
    ds = build_dataset(opt)
    s = ds[0]
    assert s['gt'].shape == (IMG, IMG, 3)
    assert s['lq'].shape == (IMG // SCALE, IMG // SCALE, 3)


def test_sisr_glob_sets(tmp_path):
    rng = np.random.RandomState(3)
    for i in range(2):
        cv2.imwrite(str(tmp_path / f'm{i}.png'),
                    (rng.rand(IMG, IMG, 3) * 255).astype(np.uint8))
    opt = {'name': 't', 'type': 'SISRManga109Set', 'phase': 'val',
           'scale': SCALE, 'dataroot_in': str(tmp_path)}
    ds = build_dataset(opt)
    assert len(ds) == 2
    s = ds[0]
    assert s['gt'].shape == (IMG, IMG, 3)
    assert s['lq'].shape == (IMG // SCALE, IMG // SCALE, 3)
    assert s['lq_path'] == 'm0.png'
