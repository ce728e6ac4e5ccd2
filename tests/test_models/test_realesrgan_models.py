"""RealESRNet / RealESRGAN micro-integration: on-device degradation
synthesis + train steps (mirrors the reference's untested
realesrgan_model.py feed_data/optimize_parameters paths)."""
import os.path as osp

import cv2
import numpy as np
import pytest

from mrefsr_tpu.data import build_dataloader, build_dataset
from mrefsr_tpu.models import build_model

GT_SIZE = 32  # crop size
IMG = 64     # dataset crop_pad_size
SCALE = 4
BATCH = 2

DEGRADE_OPTS = {
    'resize_prob': [0.2, 0.7, 0.1],
    'resize_range': [0.15, 1.5],
    'gaussian_noise_prob': 0.5,
    'noise_range': [1, 30],
    'poisson_scale_range': [0.05, 3],
    'gray_noise_prob': 0.4,
    'jpeg_range': [30, 95],
    'second_blur_prob': 0.8,
    'resize_prob2': [0.3, 0.4, 0.3],
    'resize_range2': [0.3, 1.2],
    'gaussian_noise_prob2': 0.5,
    'noise_range2': [1, 25],
    'poisson_scale_range2': [0.05, 2.5],
    'gray_noise_prob2': 0.4,
    'jpeg_range2': [30, 95],
    'queue_size': 4,
    'gt_size': GT_SIZE,
    'gt_usm': True,
    'l1_gt_usm': True,
    'percep_gt_usm': True,
    'gan_gt_usm': False,
}

DATASET_OPT = {
    'name': 'toy_realesrgan',
    'type': 'RealESRGANDataset',
    'phase': 'train',
    'scale': SCALE,
    'io_backend': {'type': 'disk'},
    'use_hflip': True,
    'use_rot': False,
    'crop_pad_size': IMG,
    'blur_kernel_size': 21,
    'kernel_list': ['iso', 'aniso', 'generalized_iso', 'generalized_aniso',
                    'plateau_iso', 'plateau_aniso'],
    'kernel_prob': [0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
    'sinc_prob': 0.1,
    'blur_sigma': [0.2, 3],
    'betag_range': [0.5, 4],
    'betap_range': [1, 2],
    'blur_kernel_size2': 21,
    'kernel_list2': ['iso', 'aniso', 'generalized_iso', 'generalized_aniso',
                     'plateau_iso', 'plateau_aniso'],
    'kernel_prob2': [0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
    'sinc_prob2': 0.1,
    'blur_sigma2': [0.2, 1.5],
    'betag_range2': [0.5, 4],
    'betap_range2': [1, 2],
    'final_sinc_prob': 0.8,
    'batch_size_per_gpu': BATCH,
    'num_worker_per_gpu': 0,
    'dataset_enlarge_ratio': 1,
}


@pytest.fixture(scope='module')
def gt_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp('reg_gt')
    rng = np.random.RandomState(0)
    for name in ('a', 'b', 'c', 'd'):
        img = (rng.rand(IMG, IMG, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / f'{name}.png'), img)
    return str(root)


def test_realesrgan_dataset(gt_folder):
    opt = dict(DATASET_OPT, dataroot_gt=gt_folder)
    ds = build_dataset(opt)
    assert len(ds) == 4
    sample = ds[0]
    assert sample['gt'].shape == (IMG, IMG, 3)
    for k in ('kernel1', 'kernel2', 'sinc_kernel'):
        assert sample[k].shape == (21, 21)
        np.testing.assert_allclose(sample[k].sum(), 1.0, atol=1e-4)


def _base_opt(tmpdir, gt_folder, model_type):
    return {
        'name': f'test_{model_type}',
        'model_type': model_type,
        'scale': SCALE,
        'num_gpu': 1,
        'manual_seed': 0,
        'is_train': True,
        'dist': False,
        'rank': 0,
        'world_size': 1,
        'high_order_degradation': True,
        **DEGRADE_OPTS,
        'network_g': {
            'type': 'MSRResNet', 'num_in_ch': 3, 'num_out_ch': 3,
            'num_feat': 4, 'num_block': 1, 'upscale': SCALE,
        },
        'path': {
            'pretrain_network_g': None,
            'strict_load_g': True,
            'models': str(tmpdir),
            'training_states': str(tmpdir),
            'visualization': str(tmpdir),
        },
        'datasets': {},
    }


def _batch(gt_folder):
    opt = dict(DATASET_OPT, dataroot_gt=gt_folder)
    ds = build_dataset(opt)
    loader = build_dataloader(ds, opt, num_gpu=1, dist=False, seed=0)
    return next(iter(loader))


def test_realesrnet_model_trains(gt_folder, tmp_path):
    opt = _base_opt(tmp_path, gt_folder, 'RealESRNetModel')
    opt['train'] = {
        'ema_decay': 0.999,
        'optim_g': {'type': 'Adam', 'lr': 2e-4, 'betas': [0.9, 0.99]},
        'scheduler': {'type': 'MultiStepLR', 'milestones': [100],
                      'gamma': 0.5},
        'pixel_opt': {'type': 'L1Loss', 'loss_weight': 1.0,
                      'reduction': 'mean'},
        'total_iter': 10, 'warmup_iter': -1,
    }
    model = build_model(opt)
    batch = _batch(gt_folder)
    for it in range(1, 4):
        model.feed_data(batch)
        assert tuple(model.lq.shape) == (BATCH, GT_SIZE // SCALE,
                                         GT_SIZE // SCALE, 3)
        assert tuple(model.gt.shape) == (BATCH, GT_SIZE, GT_SIZE, 3)
        lq = np.asarray(model.lq)
        assert lq.min() >= 0 and lq.max() <= 1
        model.optimize_parameters(it)
    assert 'l_pix' in model.log_dict
    assert np.isfinite(model.log_dict['l_pix'])


def test_degradation_synth_usm_source_flag(gt_folder, tmp_path):
    """Regression: the synthesizer unconditionally degraded from
    usm(gt). RealESRNet must degrade from gt itself (reference
    realesrnet_model.py:86; feed_data pre-sharpens iff gt_usm: true),
    while RealESRGAN keeps the always-usm source (reference
    realesrgan_model.py:183,86)."""
    import jax
    import jax.numpy as jnp

    opt = _base_opt(tmp_path, gt_folder, 'RealESRNetModel')
    from mrefsr_tpu.models.degradation_synth import DegradationSynthesizer
    synth = DegradationSynthesizer(opt)
    batch = _batch(gt_folder)
    gt = jnp.asarray(np.asarray(batch['gt'], np.float32))
    k1 = jnp.asarray(np.asarray(batch['kernel1'], np.float32))
    k2 = jnp.asarray(np.asarray(batch['kernel2'], np.float32))
    sk = jnp.asarray(np.asarray(batch['sinc_kernel'], np.float32))

    import random as _r
    _r.seed(0)
    np.random.seed(0)
    src_usm, lq_usm = synth(jax.random.PRNGKey(0), gt, k1, k2, sk,
                            usm_source=True)
    _r.seed(0)
    np.random.seed(0)
    src_raw, lq_raw = synth(jax.random.PRNGKey(0), gt, k1, k2, sk,
                            usm_source=False)
    # usm_source=False degrades from (and returns) the UNsharpened gt
    np.testing.assert_array_equal(np.asarray(src_raw), np.asarray(gt))
    assert not np.allclose(np.asarray(src_usm), np.asarray(gt))
    assert not np.allclose(np.asarray(lq_usm), np.asarray(lq_raw))


@pytest.mark.slow
def test_realesrgan_model_trains(gt_folder, tmp_path):
    opt = _base_opt(tmp_path, gt_folder, 'RealESRGANModel')
    opt['network_d'] = {'type': 'VGGStyleDiscriminator', 'num_in_ch': 3,
                        'num_feat': 32, 'input_size': GT_SIZE}
    opt['train'] = {
        'ema_decay': 0.999,
        'optim_g': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
        'optim_d': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
        'scheduler': {'type': 'MultiStepLR', 'milestones': [100],
                      'gamma': 0.5},
        'pixel_opt': {'type': 'L1Loss', 'loss_weight': 1.0,
                      'reduction': 'mean'},
        'ldl_opt': {'type': 'L1Loss', 'loss_weight': 1.0,
                    'reduction': 'mean'},
        'gan_opt': {'type': 'GANLoss', 'gan_type': 'vanilla',
                    'real_label_val': 1.0, 'fake_label_val': 0.0,
                    'loss_weight': 0.1},
        'net_d_iters': 1, 'net_d_init_iters': 0,
        'total_iter': 10, 'warmup_iter': -1,
    }
    model = build_model(opt)
    batch = _batch(gt_folder)
    for it in range(1, 3):
        model.feed_data(batch)
        assert model.gt_usm is not None
        model.optimize_parameters(it)
    for k in ('l_g_pix', 'l_g_ldl', 'l_g_gan', 'l_d_real', 'l_d_fake'):
        assert k in model.log_dict, model.log_dict.keys()
        assert np.isfinite(model.log_dict[k])


@pytest.mark.slow
def test_realesrgan_wave_fuses_device_batches(gt_folder, tmp_path):
    """RealESRGAN inherits the SRGAN fused GAN wave through the
    _train_step_inputs hook: feed_data synthesizes lq/gt ON DEVICE, so
    the wave must stack jax.Arrays with jnp (no host round-trip) and
    route the USM'd GTs per loss. Smoke: one 2-step wave dispatch,
    finite losses, the fused executable built."""
    opt = _base_opt(tmp_path, gt_folder, 'RealESRGANModel')
    opt['network_d'] = {'type': 'VGGStyleDiscriminator', 'num_in_ch': 3,
                        'num_feat': 32, 'input_size': GT_SIZE}
    opt['train'] = {
        'ema_decay': 0.999,
        'optim_g': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
        'optim_d': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
        'scheduler': {'type': 'MultiStepLR', 'milestones': [100],
                      'gamma': 0.5},
        'pixel_opt': {'type': 'L1Loss', 'loss_weight': 1.0,
                      'reduction': 'mean'},
        'gan_opt': {'type': 'GANLoss', 'gan_type': 'vanilla',
                    'real_label_val': 1.0, 'fake_label_val': 0.0,
                    'loss_weight': 0.1},
        'net_d_iters': 1, 'net_d_init_iters': 0,
        'total_iter': 10, 'warmup_iter': -1,
    }
    model = build_model(opt)
    batch = _batch(gt_folder)
    model.optimize_parameters_wave([batch, batch], 1)
    assert model._train_step_gan_wave is not None
    assert model.wave_loss_trajectory['l_g_pix'].shape == (2,)
    for k in ('l_g_pix', 'l_g_gan', 'l_d_real', 'l_d_fake'):
        assert k in model.log_dict, model.log_dict.keys()
        assert np.isfinite(model.log_dict[k])
