"""SRModel micro-integration test, modeled on the reference's
tests/test_models/test_sr_model.py:83-165: build a real model from
options, train steps, save, eval with real PSNR over a real (tiny)
dataset on disk."""
import os
import os.path as osp

import cv2
import numpy as np
import pytest

from mrefsr_tpu.data import build_dataloader, build_dataset
from mrefsr_tpu.models import build_model


@pytest.fixture(scope='module')
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp('paired')
    gt_dir = root / 'gt'
    lq_dir = root / 'lq'
    gt_dir.mkdir()
    lq_dir.mkdir()
    rng = np.random.RandomState(0)
    for name in ['a', 'b']:
        gt = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(gt_dir / f'{name}.png'), gt)
        lq = cv2.resize(gt, (8, 8), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(lq_dir / f'{name}.png'), lq)
    return str(gt_dir), str(lq_dir)


def make_opt(gt_dir, lq_dir, tmpdir):
    return {
        'name': 'test_srmodel',
        'model_type': 'SRModel',
        'scale': 4,
        'num_gpu': 1,
        'manual_seed': 0,
        'is_train': True,
        'dist': False,
        'rank': 0,
        'world_size': 1,
        'network_g': {
            'type': 'MSRResNet',
            'num_in_ch': 3,
            'num_out_ch': 3,
            'num_feat': 4,
            'num_block': 1,
            'upscale': 4,
        },
        'path': {
            'pretrain_network_g': None,
            'strict_load_g': True,
            'models': str(tmpdir),
            'training_states': str(tmpdir),
            'visualization': str(tmpdir),
        },
        'train': {
            'ema_decay': 0.999,
            'optim_g': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
            'scheduler': {'type': 'MultiStepLR', 'milestones': [5],
                          'gamma': 0.5},
            'total_iter': 10,
            'warmup_iter': -1,
            'pixel_opt': {'type': 'L1Loss', 'loss_weight': 1.0,
                          'reduction': 'mean'},
        },
        'val': {
            'val_freq': 1,
            'save_img': True,
            'metrics': {
                'psnr': {'type': 'calculate_psnr', 'crop_border': 4,
                         'test_y_channel': False},
            },
        },
    }


def test_sr_model_train_eval_save(tiny_dataset, tmp_path):
    gt_dir, lq_dir = tiny_dataset
    opt = make_opt(gt_dir, lq_dir, tmp_path)
    model = build_model(opt)

    dataset_opt = {
        'name': 'Demo',
        'type': 'PairedImageDataset',
        'dataroot_gt': gt_dir,
        'dataroot_lq': lq_dir,
        'io_backend': {'type': 'disk'},
        'gt_size': 16,
        'use_hflip': True,
        'use_rot': True,
        'phase': 'train',
        'scale': 4,
        'batch_size_per_gpu': 2,
        'num_worker_per_gpu': 0,
    }
    dataset = build_dataset(dataset_opt)
    loader = build_dataloader(dataset, dataset_opt)

    batch = next(iter(loader))
    assert batch['gt'].shape == (2, 16, 16, 3)
    assert batch['lq'].shape == (2, 4, 4, 3)

    # train two iterations
    model.feed_data(batch)
    model.optimize_parameters(1)
    first_loss = model.log_dict['l_pix']
    assert np.isfinite(first_loss)
    model.feed_data(batch)
    model.optimize_parameters(2)
    assert 'l_pix' in model.log_dict

    # lr schedule multiplies after milestone 5
    model.update_learning_rate(3)
    assert model.get_current_learning_rate()[0] == pytest.approx(1e-4)
    model.update_learning_rate(8)
    assert model.get_current_learning_rate()[0] == pytest.approx(5e-5)

    # test forward
    model.feed_data({'lq': batch['lq'], 'gt': batch['gt']})
    model.test()
    visuals = model.get_current_visuals()
    assert visuals['result'].shape == (2, 16, 16, 3)

    # save produces a reference-format .pth with params + params_ema
    model.save(epoch=0, current_iter=5)
    pth = osp.join(str(tmp_path), 'net_g_5.pth')
    assert osp.exists(pth)
    import torch
    ckpt = torch.load(pth, weights_only=True)
    assert 'params' in ckpt and 'params_ema' in ckpt
    assert any(k.endswith('conv_first.weight') for k in ckpt['params'])
    state = osp.join(str(tmp_path), '5.state')
    assert osp.exists(state)

    # validation over the real dataset with real PSNR
    val_opt = dict(dataset_opt)
    val_opt['phase'] = 'val'
    val_set = build_dataset(val_opt)
    val_loader = build_dataloader(val_set, val_opt)
    model.nondist_validation(val_loader, current_iter=5, tb_logger=None,
                             save_img=False)
    assert model.metric_results['psnr'] > 0


def test_sr_model_load_saved_checkpoint(tiny_dataset, tmp_path):
    gt_dir, lq_dir = tiny_dataset
    opt = make_opt(gt_dir, lq_dir, tmp_path)
    model = build_model(opt)
    lq = np.random.RandomState(1).rand(1, 8, 8, 3).astype(np.float32)
    model.feed_data({'lq': lq})
    model.save(epoch=0, current_iter=7)

    opt2 = make_opt(gt_dir, lq_dir, tmp_path)
    opt2['path']['pretrain_network_g'] = osp.join(str(tmp_path),
                                                  'net_g_7.pth')
    opt2['is_train'] = False
    model2 = build_model(opt2)
    model2.feed_data({'lq': lq})
    model2.test()
    model.test()
    np.testing.assert_allclose(np.asarray(model2.output),
                               np.asarray(model.output), atol=1e-5)


def test_sr_model_wave_dispatch_matches_per_step(tiny_dataset, tmp_path):
    """steps_per_dispatch wave (jitted scan over K steps) must match the
    per-step trajectory, including EMA."""
    import jax

    gt_dir, lq_dir = tiny_dataset
    batches = []
    for i in range(4):
        rng = np.random.RandomState(50 + i)
        batches.append({
            'lq': rng.rand(2, 8, 8, 3).astype(np.float32),
            'gt': rng.rand(2, 32, 32, 3).astype(np.float32),
        })

    m_seq = build_model(make_opt(gt_dir, lq_dir, tmp_path))
    for i, b in enumerate(batches, start=1):
        m_seq.feed_data(b)
        m_seq.optimize_parameters(i)

    m_wave = build_model(make_opt(gt_dir, lq_dir, tmp_path))
    m_wave.optimize_parameters_wave(batches[:2], 1)
    m_wave.optimize_parameters_wave(batches[2:], 3)

    for a, b in zip(jax.tree_util.tree_leaves(m_seq.variables['params']),
                    jax.tree_util.tree_leaves(m_wave.variables['params'])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    if m_seq.ema_decay > 0:
        for a, b in zip(
                jax.tree_util.tree_leaves(m_seq.ema_variables),
                jax.tree_util.tree_leaves(m_wave.ema_variables)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)


def test_sr_model_bf16_eval_close_to_f32(tiny_dataset, tmp_path):
    """val: mixed_precision: bfloat16 — the SRModel-family opt-in
    serving precision; output must come back f32 and close to the f32
    forward."""
    gt_dir, lq_dir = tiny_dataset
    opt = make_opt(gt_dir, lq_dir, tmp_path)
    model = build_model(opt)
    rng = np.random.RandomState(3)
    batch = {'lq': rng.rand(1, 8, 8, 3).astype(np.float32)}
    model.feed_data(batch)
    model.test()
    out_f32 = np.asarray(model.output)

    opt_bf = make_opt(gt_dir, lq_dir, tmp_path)
    opt_bf['val']['mixed_precision'] = 'bfloat16'
    model_bf = build_model(opt_bf)
    model_bf.feed_data(batch)
    model_bf.variables = model.variables
    model_bf.ema_variables = model.ema_variables
    model_bf.test()
    out_bf16 = np.asarray(model_bf.output)

    assert out_bf16.dtype == np.float32
    assert out_bf16.shape == out_f32.shape
    assert np.max(np.abs(out_bf16 - out_f32)) < 0.1
