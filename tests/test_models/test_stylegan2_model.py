"""StyleGAN2Model + FFHQDataset micro-integration (the reference ships
no tests for StyleGAN2)."""
import os.path as osp

import cv2
import numpy as np
import pytest

from mrefsr_tpu.data import build_dataloader, build_dataset
from mrefsr_tpu.models import build_model

SIZE = 32


@pytest.fixture(scope='module')
def ffhq_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('ffhq')
    rng = np.random.RandomState(0)
    for i in range(4):
        img = (rng.rand(SIZE, SIZE, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / f'{i:08d}.png'), img)
    return str(root)


def test_ffhq_dataset(ffhq_root):
    opt = {'name': 'ffhq', 'type': 'FFHQDataset', 'phase': 'train',
           'dataroot_gt': ffhq_root, 'io_backend': {'type': 'disk'},
           'mean': [0.5, 0.5, 0.5], 'std': [0.5, 0.5, 0.5],
           'use_hflip': True, 'num_images': 4}
    ds = build_dataset(opt)
    assert len(ds) == 4
    sample = ds[0]
    assert sample['gt'].shape == (SIZE, SIZE, 3)
    assert sample['gt'].min() >= -1 and sample['gt'].max() <= 1


@pytest.mark.slow
def test_stylegan2_model_trains(ffhq_root, tmp_path):
    opt = {
        'name': 'test_sg2', 'model_type': 'StyleGAN2Model',
        'scale': 1, 'num_gpu': 1, 'manual_seed': 0, 'is_train': True,
        'dist': False, 'rank': 0, 'world_size': 1,
        'network_g': {'type': 'StyleGAN2Generator', 'out_size': SIZE,
                      'num_style_feat': 16, 'num_mlp': 2,
                      'channel_multiplier': 1, 'narrow': 0.125},
        'network_d': {'type': 'StyleGAN2Discriminator', 'out_size': SIZE,
                      'channel_multiplier': 1, 'narrow': 0.125,
                      'stddev_group': 2},
        'path': {'pretrain_network_g': None, 'pretrain_network_d': None,
                 'models': str(tmp_path), 'training_states': str(tmp_path),
                 'visualization': str(tmp_path)},
        'val': {'num_val_samples': 4},
        'train': {
            'optim_g': {'type': 'Adam', 'lr': 2e-3},
            'optim_d': {'type': 'Adam', 'lr': 2e-3},
            'scheduler': {'type': 'MultiStepLR', 'milestones': [1000],
                          'gamma': 1.0},
            'gan_opt': {'type': 'GANLoss', 'gan_type': 'wgan_softplus',
                        'loss_weight': 1.0},
            'r1_reg_weight': 10., 'path_reg_weight': 2.,
            'net_g_reg_every': 2, 'net_d_reg_every': 2,
            'mixing_prob': 0.9, 'path_batch_shrink': 2,
            'total_iter': 6, 'warmup_iter': -1,
        },
        'datasets': {},
        'is_train': True,
    }
    model = build_model(opt)
    ds_opt = {'name': 'ffhq', 'type': 'FFHQDataset', 'phase': 'train',
              'dataroot_gt': ffhq_root, 'io_backend': {'type': 'disk'},
              'mean': [0.5, 0.5, 0.5], 'std': [0.5, 0.5, 0.5],
              'use_hflip': True, 'num_images': 4,
              'batch_size_per_gpu': 2, 'num_worker_per_gpu': 0,
              'dataset_enlarge_ratio': 1}
    ds = build_dataset(ds_opt)
    loader = build_dataloader(ds, ds_opt, num_gpu=1, dist=False, seed=0)
    batch = next(iter(loader))

    import random as _r
    _r.seed(0)
    for it in range(1, 5):
        model.feed_data(batch)
        model.optimize_parameters(it)
    for k in ('l_d', 'l_g', 'real_score', 'fake_score'):
        assert k in model.log_dict
        assert np.isfinite(model.log_dict[k]), (k, model.log_dict[k])
    # lazy regularizers fired on even iters
    assert 'l_d_r1' in model.log_dict
    assert 'l_g_path' in model.log_dict
    assert np.isfinite(float(model.mean_path_length))

    # validation renders the fixed-noise sample grid
    model.validation(None, current_iter=4, tb_logger=None, save_img=True)
    out = osp.join(str(tmp_path), 'train', 'train_4.png')
    assert osp.exists(out)
    img = cv2.imread(out)
    assert img is not None and img.size > 0

    model.save(epoch=0, current_iter=4)
    assert osp.exists(osp.join(str(tmp_path), 'net_g_4.pth'))
    assert osp.exists(osp.join(str(tmp_path), 'net_d_4.pth'))

    # saved checkpoint round-trips through torch in the reference layout
    import torch
    ckpt = torch.load(osp.join(str(tmp_path), 'net_g_4.pth'),
                      map_location='cpu', weights_only=True)
    assert 'params' in ckpt and 'params_ema' in ckpt

    # resume: a fresh model restores BOTH optimizer states from the
    # .state file (regression: StyleGAN2Model had no resume_training
    # override, so --auto_resume crashed on BaseModel's stub)
    import jax
    from flax import serialization
    state = model.load_training_state(osp.join(str(tmp_path), '4.state'))
    model2 = build_model(opt)
    model2.resume_training(state)
    model2.feed_data(batch)  # lazy init + deferred tree restore
    for key, live in (('opt_state_g', model2.opt_state),
                      ('opt_state_d', model2.opt_state_d)):
        got = serialization.to_bytes(
            jax.tree_util.tree_map(np.asarray, live))
        assert got == state['trees'][key], f'{key} not restored'


def test_stylegan2_test_mode_validation(tmp_path):
    """Regression: test.py calls validation without any feed_data;
    the model must build/load its nets on demand (variables were None
    and test() crashed)."""
    opt = {
        'name': 'test_sg2_eval', 'model_type': 'StyleGAN2Model',
        'scale': 1, 'num_gpu': 1, 'manual_seed': 0, 'is_train': False,
        'dist': False, 'rank': 0, 'world_size': 1,
        'network_g': {'type': 'StyleGAN2Generator', 'out_size': SIZE,
                      'num_style_feat': 16, 'num_mlp': 2,
                      'channel_multiplier': 1, 'narrow': 0.125},
        'path': {'pretrain_network_g': None,
                 'visualization': str(tmp_path)},
        'val': {'num_val_samples': 2},
    }
    model = build_model(opt)
    model.nondist_validation(None, current_iter=opt['name'],
                             tb_logger=None, save_img=True)
    out = np.asarray(model.output)
    assert out.shape == (2, SIZE, SIZE, 3)
    assert np.isfinite(out).all()
    assert osp.exists(osp.join(str(tmp_path), 'test',
                               'test_test_sg2_eval.png'))
