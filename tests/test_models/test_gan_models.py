"""SRGAN / ESRGAN / SwinIR model integration on tiny shapes."""
import numpy as np
import pytest

from mrefsr_tpu.models import build_model


def make_opt(model_type='SRGANModel'):
    return {
        'name': 'test_gan', 'model_type': model_type, 'scale': 4,
        'num_gpu': 1, 'manual_seed': 0, 'is_train': True, 'dist': False,
        'rank': 0, 'world_size': 1,
        'network_g': {'type': 'MSRResNet', 'num_in_ch': 3,
                      'num_out_ch': 3, 'num_feat': 4, 'num_block': 1,
                      'upscale': 4},
        'network_d': {'type': 'UNetDiscriminatorSN', 'num_in_ch': 3,
                      'num_feat': 4},
        'path': {},
        'train': {
            'ema_decay': 0.999,
            'optim_g': {'type': 'Adam', 'lr': 1e-4,
                        'betas': [0.9, 0.99]},
            'optim_d': {'type': 'Adam', 'lr': 1e-4,
                        'betas': [0.9, 0.99]},
            'scheduler': {'type': 'MultiStepLR', 'milestones': [100],
                          'gamma': 0.5},
            'total_iter': 10, 'warmup_iter': -1,
            'pixel_opt': {'type': 'L1Loss', 'loss_weight': 1.0,
                          'reduction': 'mean'},
            'gan_opt': {'type': 'GANLoss', 'gan_type': 'vanilla',
                        'real_label_val': 1.0, 'fake_label_val': 0.0,
                        'loss_weight': 0.1},
            'net_d_iters': 1, 'net_d_init_iters': 0,
        },
        'val': {'val_freq': 100, 'save_img': False,
                'metrics': {'psnr': {'type': 'calculate_psnr',
                                     'crop_border': 4}}},
    }


@pytest.mark.parametrize('model_type', ['SRGANModel', 'ESRGANModel'])
def test_gan_model_step(model_type):
    opt = make_opt(model_type)
    model = build_model(opt)
    rng = np.random.RandomState(0)
    batch = {
        'lq': rng.rand(2, 8, 8, 3).astype(np.float32),
        'gt': rng.rand(2, 32, 32, 3).astype(np.float32),
    }
    model.feed_data(batch)
    model.optimize_parameters(1)
    for key in ('l_g_pix', 'l_g_gan', 'l_d_real', 'l_d_fake'):
        assert key in model.log_dict, key
        assert np.isfinite(model.log_dict[key]), key
    model.test()
    assert np.asarray(model.output).shape == (2, 32, 32, 3)


def test_swinir_model_padded_test():
    opt = make_opt('SwinIRModel')
    opt['network_g'] = {'type': 'SwinIR', 'img_size': 16, 'embed_dim': 8,
                        'depths': [2], 'num_heads': [2], 'window_size': 4,
                        'mlp_ratio': 2.0, 'upscale': 4,
                        'upsampler': 'pixelshuffledirect'}
    opt['is_train'] = False
    opt.pop('network_d')
    opt['train'].pop('gan_opt')
    model = build_model(opt)
    # 10x14 is not a multiple of window 4 -> reflect pad then crop
    lq = np.random.RandomState(0).rand(1, 10, 14, 3).astype(np.float32)
    model.feed_data({'lq': lq})
    model.test()
    assert np.asarray(model.output).shape == (1, 40, 56, 3)


@pytest.mark.slow
def test_gan_model_perceptual_zero_style_weight():
    """Regression: with perceptual_opt at style_weight=0 (the standard
    ESRGAN setup) the skip_g branch must emit the same aux pytree as
    the g branch, or lax.cond rejects the trace."""
    opt = make_opt('SRGANModel')
    opt['train']['perceptual_opt'] = {
        'type': 'PerceptualLoss',
        'layer_weights': {'conv5_4': 1.0},
        'vgg_type': 'vgg19', 'use_input_norm': True, 'range_norm': False,
        'perceptual_weight': 1.0, 'style_weight': 0.0,
        'criterion': 'l1'}
    # net_d_init_iters=1 forces a skipped-G step (iter 1) AND a g step
    opt['train']['net_d_init_iters'] = 1
    model = build_model(opt)
    rng = np.random.RandomState(1)
    batch = {'lq': rng.rand(1, 8, 8, 3).astype(np.float32),
             'gt': rng.rand(1, 32, 32, 3).astype(np.float32)}
    model.feed_data(batch)
    model.optimize_parameters(1)   # g skipped
    assert model.log_dict['l_g_percep'] == 0.0
    assert 'l_g_style' not in model.log_dict
    model.optimize_parameters(2)   # g runs
    assert np.isfinite(model.log_dict['l_g_percep'])
    assert model.log_dict['l_g_percep'] != 0.0


def test_gan_resume_restores_d_optimizer_state(tmp_path):
    """Regression: SRModel._ensure_initialized ran _restore_trees
    before the D optimizer existed, silently dropping the opt_state_d
    entry — every resumed GAN run restarted D with zeroed Adam moments
    and its LR-schedule count reset to 0. The entry must stay pending
    and restore once the D optimizer is built."""
    import os.path as osp

    import jax
    from flax import serialization

    opt = make_opt('SRGANModel')
    opt['path'] = {'models': str(tmp_path),
                   'training_states': str(tmp_path),
                   'visualization': str(tmp_path)}
    model = build_model(opt)
    rng = np.random.RandomState(3)
    batch = {'lq': rng.rand(1, 8, 8, 3).astype(np.float32),
             'gt': rng.rand(1, 32, 32, 3).astype(np.float32)}
    for i in range(1, 4):
        model.feed_data(batch)
        model.optimize_parameters(i)
    model.save(0, 3)

    state = model.load_training_state(osp.join(str(tmp_path), '3.state'))
    saved_g = state['trees']['opt_state_g']
    saved_d = state['trees']['opt_state_d']
    model2 = build_model(opt)
    model2.resume_training(state)
    model2.feed_data(batch)  # lazy init + deferred tree restore

    def to_bytes(tree):
        return serialization.to_bytes(
            jax.tree_util.tree_map(np.asarray, tree))

    # sanity: a fresh D optimizer state differs from the trained one
    model3 = build_model(opt)
    model3.feed_data(batch)
    assert to_bytes(model3.opt_state_d) != saved_d

    assert to_bytes(model2.opt_state) == saved_g
    assert to_bytes(model2.opt_state_d) == saved_d


def test_gan_d_trains_on_pre_update_generator_output():
    """Regression: the reference computes self.output BEFORE
    optimizer_g.step() and trains D on its detached value
    (srgan_model.py:95,129-146); the D step must not re-run the
    updated generator."""
    import jax.numpy as jnp
    opt = make_opt('SRGANModel')
    model = build_model(opt)
    rng = np.random.RandomState(2)
    batch = {'lq': rng.rand(1, 8, 8, 3).astype(np.float32),
             'gt': rng.rand(1, 32, 32, 3).astype(np.float32)}
    import jax
    model.feed_data(batch)
    pre_update_out = np.asarray(model.net_g.apply(
        {'params': model.variables['params']}, jnp.asarray(batch['lq'])))
    # deep-copy D vars before the step (the jitted step donates them)
    vars_d_before = jax.tree_util.tree_map(np.asarray, model.vars_d)
    model.optimize_parameters(1)
    post_update_out = np.asarray(model.net_g.apply(
        {'params': model.variables['params']}, jnp.asarray(batch['lq'])))
    # sanity: the update actually changed the generator
    assert not np.allclose(pre_update_out, post_update_out)
    # the logged out_d_fake must equal D(pre-update output), not
    # D(post-update output) — mirror the D step's forward order (real
    # first, then fake) so the spectral-norm power-iteration state
    # matches the step's exactly
    dv0 = jax.tree_util.tree_map(jnp.asarray, vars_d_before)
    _, dv1 = model._apply_d(dv0, jnp.asarray(batch['gt']), train=True)
    fake_pre = float(model._apply_d(
        dv1, jnp.asarray(pre_update_out), train=True)[0].mean())
    fake_post = float(model._apply_d(
        dv1, jnp.asarray(post_update_out), train=True)[0].mean())
    assert abs(model.log_dict['out_d_fake'] - fake_pre) < 1e-4
    assert abs(fake_pre - fake_post) > 1e-7  # the two are distinguishable


@pytest.mark.slow
def test_srgan_wave_dispatch_matches_per_step():
    """The SRGAN-family GAN wave (_train_step_gan_wave: one lax.scan
    dispatch over K steps, g_turn computed from the traced step index)
    must reproduce the per-step trajectory. Oracle is the per-step LOSS
    TRAJECTORY plus an update-scale params envelope — exact-params
    equality across two different XLA compiles is not fp-stable under
    Adam (see the multi-ref GAN wave test). net_d_iters=2 with
    net_d_init_iters=1 makes the wave cover G-updated and G-skipped
    steps."""
    import jax

    def wave_opt():
        opt = make_opt('SRGANModel')
        opt['train']['net_d_iters'] = 2
        opt['train']['net_d_init_iters'] = 1
        return opt

    batches = [{
        'lq': np.random.RandomState(40 + i).rand(
            2, 8, 8, 3).astype(np.float32),
        'gt': np.random.RandomState(140 + i).rand(
            2, 32, 32, 3).astype(np.float32),
    } for i in range(4)]

    m_seq = build_model(wave_opt())
    seq_traj = []
    for i, b in enumerate(batches, start=1):
        m_seq.feed_data(b)
        m_seq.optimize_parameters(i)
        seq_traj.append(dict(m_seq.log_dict))

    m_wave = build_model(wave_opt())
    m_wave.optimize_parameters_wave(batches, 1)

    traj = m_wave.wave_loss_trajectory
    for key in ('l_g_pix', 'l_g_gan', 'l_d_real', 'l_d_fake'):
        assert key in traj, key
        np.testing.assert_allclose(
            np.asarray(traj[key]),
            np.asarray([t[key] for t in seq_traj]),
            rtol=5e-3, atol=1e-5, err_msg=key)
    # G skipped on odd iters (1 % 2 != 0 and 1 <= init): zero l_g_*
    assert traj['l_g_gan'][0] == 0 and traj['l_g_gan'][2] == 0
    assert traj['l_g_gan'][1] != 0 and traj['l_g_gan'][3] != 0

    for attr in ('variables', 'vars_d', 'ema_variables'):
        seq = jax.tree_util.tree_leaves(getattr(m_seq, attr))
        wav = jax.tree_util.tree_leaves(getattr(m_wave, attr))
        assert len(seq) == len(wav)
        for a, b in zip(seq, wav):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-2, atol=1e-3)


def test_esrgan_wave_smoke_and_fallback_rules():
    """ESRGAN inherits the fused wave (it only flips _relativistic);
    a subclass overriding optimize_parameters itself must fall back to
    per-step dispatch."""
    opt = make_opt('ESRGANModel')
    model = build_model(opt)
    batches = [{
        'lq': np.random.RandomState(60 + i).rand(
            1, 8, 8, 3).astype(np.float32),
        'gt': np.random.RandomState(160 + i).rand(
            1, 32, 32, 3).astype(np.float32),
    } for i in range(2)]
    model.optimize_parameters_wave(batches, 1)
    assert model._train_step_gan_wave is not None
    for key in ('l_g_gan', 'l_d_real', 'l_d_fake'):
        assert np.isfinite(model.log_dict[key]), key

    # fallback rule: a subclass that overrides optimize_parameters
    # itself (not just _train_step_inputs) must get K per-step
    # dispatches, never the fused executable
    from mrefsr_tpu.models.srgan_model import SRGANModel

    class _Overriding(SRGANModel):
        calls = 0

        def optimize_parameters(self, current_iter):
            type(self).calls += 1
            super().optimize_parameters(current_iter)

    model2 = _Overriding(make_opt('SRGANModel'))
    model2.optimize_parameters_wave(batches, 1)
    assert _Overriding.calls == len(batches)
    assert getattr(model2, '_train_step_gan_wave', None) is None
