"""HiFaceGANModel micro-integration: conditional multiscale-D GAN with
feature matching + spectral-norm state threading."""
import cv2
import numpy as np
import pytest

from mrefsr_tpu.data import build_dataloader, build_dataset
from mrefsr_tpu.models import build_model

SIZE = 64


@pytest.fixture(scope='module')
def face_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('faces')
    (root / 'gt').mkdir()
    (root / 'lq').mkdir()
    rng = np.random.RandomState(0)
    for n in ('a', 'b'):
        gt = (rng.rand(SIZE, SIZE, 3) * 255).astype(np.uint8)
        lq = cv2.GaussianBlur(gt, (7, 7), 2)
        cv2.imwrite(str(root / 'gt' / f'{n}.png'), gt)
        cv2.imwrite(str(root / 'lq' / f'{n}.png'), lq)
    return root


def make_opt(tmp_path):
    return {
        'name': 'test_hifacegan', 'model_type': 'HiFaceGANModel',
        'scale': 1, 'num_gpu': 1, 'manual_seed': 0, 'is_train': True,
        'dist': False, 'rank': 0, 'world_size': 1,
        'network_g': {'type': 'HiFaceGAN', 'num_in_ch': 3, 'num_feat': 4,
                      'crop_size': SIZE, 'is_train': True},
        'network_d': {'type': 'HiFaceGANDiscriminator', 'num_in_ch': 3,
                      'num_out_ch': 3, 'num_d': 2, 'n_layers_d': 3,
                      'num_feat': 8},
        'path': {'pretrain_network_g': None, 'pretrain_network_d': None,
                 'strict_load_g': True,
                 'models': str(tmp_path), 'training_states': str(tmp_path),
                 'visualization': str(tmp_path)},
        'train': {
            'optim_g': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
            'optim_d': {'type': 'Adam', 'lr': 4e-4, 'betas': [0.9, 0.99]},
            'scheduler': {'type': 'MultiStepLR', 'milestones': [100],
                          'gamma': 0.5},
            'pixel_opt': {'type': 'L1Loss', 'loss_weight': 1.0,
                          'reduction': 'mean'},
            'gan_opt': {'type': 'MultiScaleGANLoss', 'gan_type': 'hinge',
                        'loss_weight': 1.0},
            'feature_matching_opt': {'type': 'GANFeatLoss',
                                     'criterion': 'l1',
                                     'loss_weight': 10.0},
            'net_d_iters': 1, 'net_d_init_iters': 0,
            'total_iter': 5, 'warmup_iter': -1,
        },
        'datasets': {},
    }


def make_batch(face_root):
    ds_opt = {'name': 'faces', 'type': 'PairedImageDataset',
              'phase': 'train', 'scale': 1,
              'dataroot_gt': str(face_root / 'gt'),
              'dataroot_lq': str(face_root / 'lq'),
              'io_backend': {'type': 'disk'}, 'gt_size': SIZE,
              'use_hflip': False, 'use_rot': False,
              'batch_size_per_gpu': 2, 'num_worker_per_gpu': 0,
              'dataset_enlarge_ratio': 1}
    ds = build_dataset(ds_opt)
    loader = build_dataloader(ds, ds_opt, num_gpu=1, dist=False, seed=0)
    return next(iter(loader))


@pytest.mark.slow
def test_hifacegan_model_trains(face_root, tmp_path):
    opt = make_opt(tmp_path)
    model = build_model(opt)
    batch = make_batch(face_root)

    spectral_before = None
    for it in range(1, 3):
        model.feed_data(batch)
        if spectral_before is None and 'spectral' in model.vars_d:
            import jax
            spectral_before = jax.tree_util.tree_map(
                np.asarray, model.vars_d['spectral'])
        model.optimize_parameters(it)

    for k in ('l_g_pix', 'l_g_gan', 'l_g_feat', 'l_d_real', 'l_d_fake'):
        assert k in model.log_dict, model.log_dict.keys()
        assert np.isfinite(model.log_dict[k]), (k, model.log_dict[k])

    # spectral power-iteration state must have updated during D steps
    import jax
    spectral_after = jax.tree_util.tree_map(np.asarray,
                                            model.vars_d['spectral'])
    moved = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, b), spectral_before,
        spectral_after)
    assert any(jax.tree_util.tree_leaves(moved)), \
        'spectral u/v must update during training'


@pytest.mark.slow
def test_hifacegan_wave_dispatch_matches_per_step(face_root, tmp_path):
    """The HiFaceGAN wave (one lax.scan dispatch over K steps, g_turn
    from the traced step index) must reproduce the per-step loss
    trajectory; params held to the update-scale envelope (exact-params
    equality across two XLA compiles is not fp-stable under Adam —
    same oracle as the SRGAN/multi-ref GAN waves)."""
    import jax

    def wave_opt():
        opt = make_opt(tmp_path)
        opt['train']['net_d_iters'] = 2
        opt['train']['net_d_init_iters'] = 1
        return opt

    batch = make_batch(face_root)
    rng = np.random.RandomState(5)
    batches = [{'lq': batch['lq'] + rng.rand(*np.asarray(
                    batch['lq']).shape).astype(np.float32) * 0.01,
                'gt': batch['gt']} for _ in range(4)]

    m_seq = build_model(wave_opt())
    seq_traj = []
    for i, b in enumerate(batches, start=1):
        m_seq.feed_data(b)
        m_seq.optimize_parameters(i)
        seq_traj.append(dict(m_seq.log_dict))

    m_wave = build_model(wave_opt())
    m_wave.optimize_parameters_wave(batches, 1)

    traj = m_wave.wave_loss_trajectory
    for key in ('l_g_pix', 'l_g_gan', 'l_g_feat', 'l_d_real',
                'l_d_fake'):
        assert key in traj, key
        np.testing.assert_allclose(
            np.asarray(traj[key]),
            np.asarray([t[key] for t in seq_traj]),
            rtol=5e-3, atol=1e-5, err_msg=key)
    # G skipped on odd iters (cur % 2 != 0 or cur <= 1)
    assert traj['l_g_gan'][0] == 0 and traj['l_g_gan'][2] == 0
    assert traj['l_g_gan'][1] != 0 and traj['l_g_gan'][3] != 0

    for attr in ('variables', 'vars_d'):
        seq = jax.tree_util.tree_leaves(getattr(m_seq, attr))
        wav = jax.tree_util.tree_leaves(getattr(m_wave, attr))
        assert len(seq) == len(wav)
        for a, b in zip(seq, wav):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-2, atol=1e-3)
