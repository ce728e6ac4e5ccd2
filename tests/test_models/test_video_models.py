"""Video dataset + model micro-integration tests (the reference ships
no tests for its video models — reference SURVEY §4 gap)."""
import os.path as osp

import cv2
import numpy as np
import pytest

import jax

from mrefsr_tpu.data import build_dataloader, build_dataset
from mrefsr_tpu.models import build_model

SCALE = 4
LQ = 64         # lq frame size (SpyNet's flow init is h/64 — needs >=64)
GT = LQ * SCALE
NF = 5          # frames per clip sample
CLIP_LEN = 100  # REDS clips are always 100 frames (reference hardcodes 0..99)


@pytest.fixture(scope='module')
def video_root(tmp_path_factory):
    """Two clips of CLIP_LEN frames in REDS folder layout + meta info."""
    root = tmp_path_factory.mktemp('videos')
    rng = np.random.RandomState(0)
    for clip in ('000', '001'):
        (root / 'gt' / clip).mkdir(parents=True)
        (root / 'lq' / clip).mkdir(parents=True)
        for i in range(CLIP_LEN):
            gt = (rng.rand(GT, GT, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(root / 'gt' / clip / f'{i:08d}.png'), gt)
            lq = cv2.resize(gt, (LQ, LQ), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(str(root / 'lq' / clip / f'{i:08d}.png'), lq)
    meta = root / 'meta_info.txt'
    meta.write_text(f'000 {CLIP_LEN} ({GT},{GT},3)\n'
                    f'001 {CLIP_LEN} ({GT},{GT},3)\n')
    return root


def test_reds_dataset(video_root):
    # center windows must stay inside the clip: keys with frame<=99 ok,
    # our clips have 12 frames so use small interval
    opt = {
        'name': 'reds', 'type': 'REDSDataset', 'phase': 'train',
        'scale': SCALE, 'gt_size': GT,
        'dataroot_gt': str(video_root / 'gt'),
        'dataroot_lq': str(video_root / 'lq'),
        'dataroot_flow': None,
        'meta_info_file': str(video_root / 'meta_info.txt'),
        'val_partition': 'official',
        'io_backend': {'type': 'disk'},
        'num_frame': NF, 'interval_list': [1], 'random_reverse': True,
        'use_hflip': True, 'use_rot': True,
    }
    ds = build_dataset(opt)
    assert len(ds) == 2 * CLIP_LEN
    # pick a safe center index
    sample = ds[6]
    assert sample['lq'].shape == (NF, LQ, LQ, 3)
    assert sample['gt'].shape == (GT, GT, 3)


def test_reds_recurrent_dataset(video_root):
    opt = {
        'name': 'redsrec', 'type': 'REDSRecurrentDataset',
        'phase': 'train', 'scale': SCALE, 'gt_size': GT,
        'dataroot_gt': str(video_root / 'gt'),
        'dataroot_lq': str(video_root / 'lq'),
        'meta_info_file': str(video_root / 'meta_info.txt'),
        'val_partition': 'official', 'test_mode': False,
        'io_backend': {'type': 'disk'},
        'num_frame': NF, 'interval_list': [1], 'random_reverse': False,
        'use_hflip': False, 'use_rot': False,
    }
    ds = build_dataset(opt)
    sample = ds[0]
    assert sample['lq'].shape == (NF, LQ, LQ, 3)
    assert sample['gt'].shape == (NF, GT, GT, 3)


def test_video_test_dataset(video_root):
    opt = {
        'name': 'REDS4', 'type': 'VideoTestDataset', 'phase': 'val',
        'scale': SCALE, 'cache_data': True,
        'dataroot_gt': str(video_root / 'gt'),
        'dataroot_lq': str(video_root / 'lq'),
        'io_backend': {'type': 'disk'},
        'num_frame': NF, 'padding': 'reflection_circle',
    }
    ds = build_dataset(opt)
    assert len(ds) == 2 * CLIP_LEN
    sample = ds[0]
    assert sample['lq'].shape == (NF, LQ, LQ, 3)
    assert sample['gt'].shape == (GT, GT, 3)
    assert sample['border'] == 1
    sample_mid = ds[CLIP_LEN // 2]
    assert sample_mid['border'] == 0


def test_video_recurrent_test_dataset(video_root):
    opt = {
        'name': 'REDS4', 'type': 'VideoRecurrentTestDataset',
        'phase': 'val', 'scale': SCALE, 'cache_data': True,
        'dataroot_gt': str(video_root / 'gt'),
        'dataroot_lq': str(video_root / 'lq'),
        'io_backend': {'type': 'disk'},
        'num_frame': NF, 'padding': 'reflection_circle',
    }
    ds = build_dataset(opt)
    assert len(ds) == 2  # folders
    sample = ds[0]
    assert sample['lq'].shape == (CLIP_LEN, LQ, LQ, 3)
    assert sample['gt'].shape == (CLIP_LEN, GT, GT, 3)


def _recurrent_batch(video_root, n=1, t=NF):
    opt = {
        'name': 'redsrec', 'type': 'REDSRecurrentDataset',
        'phase': 'train', 'scale': SCALE, 'gt_size': GT,
        'dataroot_gt': str(video_root / 'gt'),
        'dataroot_lq': str(video_root / 'lq'),
        'meta_info_file': str(video_root / 'meta_info.txt'),
        'val_partition': 'official', 'test_mode': False,
        'io_backend': {'type': 'disk'},
        'num_frame': t, 'interval_list': [1], 'random_reverse': False,
        'use_hflip': False, 'use_rot': False,
        'batch_size_per_gpu': n, 'num_worker_per_gpu': 0,
        'dataset_enlarge_ratio': 1,
    }
    ds = build_dataset(opt)
    loader = build_dataloader(ds, opt, num_gpu=1, dist=False, seed=0)
    return next(iter(loader))


@pytest.mark.slow
def test_video_recurrent_model_trains_with_flow_freeze(video_root,
                                                       tmp_path):
    opt = {
        'name': 'test_vrm', 'model_type': 'VideoRecurrentModel',
        'scale': SCALE, 'num_gpu': 1, 'manual_seed': 0, 'is_train': True,
        'dist': False, 'rank': 0, 'world_size': 1,
        'network_g': {'type': 'BasicVSR', 'num_feat': 8, 'num_block': 1,
                      'spynet_path': None},
        'path': {'pretrain_network_g': None, 'strict_load_g': True,
                 'models': str(tmp_path), 'training_states': str(tmp_path),
                 'visualization': str(tmp_path)},
        'train': {
            'ema_decay': 0,
            'optim_g': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
            'scheduler': {'type': 'MultiStepLR', 'milestones': [100],
                          'gamma': 0.5},
            'pixel_opt': {'type': 'CharbonnierLoss', 'loss_weight': 1.0,
                          'reduction': 'mean'},
            'total_iter': 10, 'warmup_iter': -1,
            'fix_flow': 2, 'flow_lr_mul': 0.125,
        },
        'datasets': {},
    }
    model = build_model(opt)
    batch = _recurrent_batch(video_root)
    model.feed_data(batch)

    def flatten(tree, prefix=''):
        out = {}
        for k, v in tree.items():
            key = f'{prefix}.{k}' if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, key))
            else:
                out[key] = np.asarray(v)
        return out

    before = flatten(model.variables['params'])
    model.optimize_parameters(1)  # step_idx 0 < fix_flow=2 -> frozen
    after = flatten(model.variables['params'])
    spynet_moved = sum(
        not np.allclose(before[k], after[k])
        for k in before if 'spynet' in k)
    other_moved = sum(
        not np.allclose(before[k], after[k])
        for k in before if 'spynet' not in k)
    assert spynet_moved == 0, 'spynet params must stay frozen'
    assert other_moved > 0, 'non-flow params must train'

    # past the freeze boundary the flow net trains too
    model.optimize_parameters(2)
    model.optimize_parameters(3)
    after3 = flatten(model.variables['params'])
    spynet_moved = sum(
        not np.allclose(after[k], after3[k])
        for k in after if 'spynet' in k)
    assert spynet_moved > 0, 'spynet params must train after fix_flow'
    assert np.isfinite(model.log_dict['l_pix'])


@pytest.mark.slow
def test_video_recurrent_model_validation(video_root, tmp_path):
    opt = {
        'name': 'test_vrm_val', 'model_type': 'VideoRecurrentModel',
        'scale': SCALE, 'num_gpu': 1, 'manual_seed': 0, 'is_train': False,
        'dist': False, 'rank': 0, 'world_size': 1,
        'network_g': {'type': 'BasicVSR', 'num_feat': 8, 'num_block': 1,
                      'spynet_path': None},
        'path': {'pretrain_network_g': None, 'strict_load_g': True,
                 'models': str(tmp_path), 'training_states': str(tmp_path),
                 'visualization': str(tmp_path)},
        'val': {'metrics': {'psnr': {'type': 'calculate_psnr',
                                     'crop_border': 0,
                                     'test_y_channel': False}},
                'flip_seq': False},
        'datasets': {},
    }
    model = build_model(opt)
    ds_opt = {
        'name': 'REDS4', 'type': 'VideoRecurrentTestDataset',
        'phase': 'val', 'scale': SCALE, 'cache_data': True,
        'dataroot_gt': str(video_root / 'gt'),
        'dataroot_lq': str(video_root / 'lq'),
        'io_backend': {'type': 'disk'},
        'num_frame': NF, 'padding': 'reflection_circle',
    }
    ds = build_dataset(ds_opt)
    loader = build_dataloader(ds, ds_opt, num_gpu=1, dist=False)
    model.validation(loader, current_iter=1, tb_logger=None,
                     save_img=False)
    assert '000' in model.metric_results
    assert model.metric_results['000'].shape == (CLIP_LEN, 1)
    assert (model.metric_results['000'] > 0).all()


@pytest.mark.slow
def test_edvr_model_tsa_phase(video_root, tmp_path):
    opt = {
        'name': 'test_edvr', 'model_type': 'EDVRModel',
        'scale': SCALE, 'num_gpu': 1, 'manual_seed': 0, 'is_train': True,
        'dist': False, 'rank': 0, 'world_size': 1,
        'network_g': {'type': 'EDVR', 'num_in_ch': 3, 'num_out_ch': 3,
                      'num_feat': 8, 'num_frame': NF,
                      'deformable_groups': 2, 'num_extract_block': 1,
                      'num_reconstruct_block': 1, 'with_tsa': True},
        'path': {'pretrain_network_g': None, 'strict_load_g': True,
                 'models': str(tmp_path), 'training_states': str(tmp_path),
                 'visualization': str(tmp_path)},
        'train': {
            'ema_decay': 0,
            'optim_g': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
            'scheduler': {'type': 'MultiStepLR', 'milestones': [100],
                          'gamma': 0.5},
            'pixel_opt': {'type': 'CharbonnierLoss', 'loss_weight': 1.0,
                          'reduction': 'mean'},
            'total_iter': 10, 'warmup_iter': -1,
            'tsa_iter': 2, 'dcn_lr_mul': 0.5,
        },
        'datasets': {},
    }
    model = build_model(opt)
    # sliding-window REDS batch
    ds_opt = {
        'name': 'reds', 'type': 'REDSDataset', 'phase': 'train',
        'scale': SCALE, 'gt_size': GT,
        'dataroot_gt': str(video_root / 'gt'),
        'dataroot_lq': str(video_root / 'lq'),
        'dataroot_flow': None,
        'meta_info_file': str(video_root / 'meta_info.txt'),
        'val_partition': 'official',
        'io_backend': {'type': 'disk'},
        'num_frame': NF, 'interval_list': [1], 'random_reverse': False,
        'use_hflip': False, 'use_rot': False,
        'batch_size_per_gpu': 1, 'num_worker_per_gpu': 0,
        'dataset_enlarge_ratio': 1,
    }
    ds = build_dataset(ds_opt)
    loader = build_dataloader(ds, ds_opt, num_gpu=1, dist=False, seed=0)
    batch = next(iter(loader))
    model.feed_data(batch)

    params_before = jax.tree_util.tree_map(np.asarray,
                                           model.variables['params'])
    model.optimize_parameters(1)  # TSA-only phase
    params_after = model.variables['params']

    moved_nonfusion, moved_fusion = [], []
    flat_b = jax.tree_util.tree_leaves_with_path(params_before)
    flat_a = dict(jax.tree_util.tree_leaves_with_path(params_after))
    for path, b in flat_b:
        a = np.asarray(flat_a[path])
        name = '.'.join(str(getattr(k, 'key', k)) for k in path)
        if not np.allclose(b, a):
            (moved_fusion if 'fusion' in name
             else moved_nonfusion).append(name)
    assert not moved_nonfusion, \
        f'non-fusion params trained during TSA phase: {moved_nonfusion[:5]}'
    assert moved_fusion, 'fusion params must train during TSA phase'
    assert np.isfinite(model.log_dict['l_pix'])

    # at current_iter == tsa_iter the reference UNFREEZES before the
    # step (edvr_model sets requires_grad True at that iter), so iter 2
    # must train non-fusion params too (regression: the freeze lasted
    # one iteration longer than the reference)
    params_before2 = jax.tree_util.tree_map(np.asarray,
                                            model.variables['params'])
    model.feed_data(batch)
    model.optimize_parameters(2)
    flat_b2 = jax.tree_util.tree_leaves_with_path(params_before2)
    flat_a2 = dict(jax.tree_util.tree_leaves_with_path(
        model.variables['params']))
    moved_nonfusion2 = [
        '.'.join(str(getattr(k, 'key', k)) for k in path)
        for path, b in flat_b2
        if 'fusion' not in '.'.join(str(getattr(k, 'key', k))
                                    for k in path)
        and not np.allclose(b, np.asarray(flat_a2[path]))]
    assert moved_nonfusion2, \
        'non-fusion params must train at iter == tsa_iter'


@pytest.mark.slow
def test_video_recurrent_gan_wave_matches_per_step(video_root, tmp_path):
    """VideoRecurrentGANModel inherits the SRGAN fused GAN wave (it
    does not override optimize_parameters), so K steps fuse into one
    lax.scan dispatch over (b,t,...) sequences — with the flow-freeze
    boundary (fix_flow) crossing INSIDE the wave, since freeze masks
    are computed from the traced step index. Oracle: per-step loss
    trajectory + update-scale params envelope (see the SRGAN wave
    test)."""
    def gan_opt():
        return {
            'name': 'test_vrgan', 'model_type': 'VideoRecurrentGANModel',
            'scale': SCALE, 'num_gpu': 1, 'manual_seed': 0,
            'is_train': True, 'dist': False, 'rank': 0, 'world_size': 1,
            'network_g': {'type': 'BasicVSR', 'num_feat': 8,
                          'num_block': 1, 'spynet_path': None},
            'network_d': {'type': 'UNetDiscriminatorSN', 'num_in_ch': 3,
                          'num_feat': 4},
            'path': {'pretrain_network_g': None, 'strict_load_g': True,
                     'models': str(tmp_path),
                     'training_states': str(tmp_path),
                     'visualization': str(tmp_path)},
            'train': {
                'ema_decay': 0,
                'optim_g': {'type': 'Adam', 'lr': 1e-4,
                            'betas': [0.9, 0.99]},
                'optim_d': {'type': 'Adam', 'lr': 1e-4,
                            'betas': [0.9, 0.99]},
                'scheduler': {'type': 'MultiStepLR', 'milestones': [100],
                              'gamma': 0.5},
                'pixel_opt': {'type': 'CharbonnierLoss',
                              'loss_weight': 1.0, 'reduction': 'mean'},
                'gan_opt': {'type': 'GANLoss', 'gan_type': 'vanilla',
                            'real_label_val': 1.0, 'fake_label_val': 0.0,
                            'loss_weight': 0.1},
                'net_d_iters': 1, 'net_d_init_iters': 0,
                'total_iter': 10, 'warmup_iter': -1,
                'fix_flow': 2, 'flow_lr_mul': 0.125,
            },
            'datasets': {},
        }

    base = _recurrent_batch(video_root, t=3)
    rng = np.random.RandomState(9)
    batches = [{'lq': np.asarray(base['lq'])
                + rng.rand(*np.asarray(base['lq']).shape).astype(
                    np.float32) * 0.01,
                'gt': base['gt']} for _ in range(3)]

    m_seq = build_model(gan_opt())
    seq_traj = []
    for i, b in enumerate(batches, start=1):
        m_seq.feed_data(b)
        m_seq.optimize_parameters(i)
        seq_traj.append(dict(m_seq.log_dict))

    m_wave = build_model(gan_opt())
    m_wave.optimize_parameters_wave(batches, 1)

    traj = m_wave.wave_loss_trajectory
    for key in ('l_g_pix', 'l_g_gan', 'l_d_real', 'l_d_fake'):
        assert key in traj, key
        np.testing.assert_allclose(
            np.asarray(traj[key]),
            np.asarray([t[key] for t in seq_traj]),
            rtol=5e-3, atol=1e-5, err_msg=key)

    # flow freeze crossed inside the wave: spynet frozen on steps 1-2
    # (idx 0,1 < fix_flow=2), training on step 3 — mirror the per-step
    # trajectory's params to within the update envelope
    for attr in ('variables', 'vars_d'):
        seq = jax.tree_util.tree_leaves(getattr(m_seq, attr))
        wav = jax.tree_util.tree_leaves(getattr(m_wave, attr))
        assert len(seq) == len(wav)
        for a, b in zip(seq, wav):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-2, atol=1e-3)
