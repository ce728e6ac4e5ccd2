"""Loss-layer unit tests, mirroring the reference's
tests/test_losses/test_losses.py (pixel losses across reductions incl.
error paths, WeightedTVLoss) plus GANLoss numerics vs torch and the
legacy-stack regressions (MaskedTVLoss default, TextureLoss weight
branches)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F_t

import jax.numpy as jnp

from mrefsr_tpu.losses.losses import (CharbonnierLoss, GANLoss, L1Loss,
                                      MSELoss, WeightedTVLoss)

RNG = np.random.RandomState(3)


@pytest.mark.parametrize('loss_class', [L1Loss, MSELoss, CharbonnierLoss])
def test_pixel_losses(loss_class):
    pred = jnp.asarray(RNG.rand(1, 4, 4, 3).astype(np.float32))
    target = jnp.asarray(RNG.rand(1, 4, 4, 3).astype(np.float32))
    out = loss_class(loss_weight=1.0, reduction='mean')(pred, target)
    assert np.asarray(out).shape == ()

    loss = loss_class(loss_weight=1.0, reduction='none')
    out = loss(pred, target, weight=None)
    assert np.asarray(out).shape == (1, 4, 4, 3)
    weight = jnp.asarray(RNG.rand(1, 4, 4, 3).astype(np.float32))
    out = loss(pred, target, weight=weight)
    assert np.asarray(out).shape == (1, 4, 4, 3)

    out = loss_class(loss_weight=1.0, reduction='sum')(pred, target)
    assert np.asarray(out).shape == ()

    with pytest.raises(ValueError):
        loss_class(loss_weight=1.0, reduction='unknown')


def test_pixel_loss_values_match_torch():
    pred = RNG.rand(2, 4, 4, 3).astype(np.float32)
    target = RNG.rand(2, 4, 4, 3).astype(np.float32)
    tp, tt = torch.from_numpy(pred), torch.from_numpy(target)
    assert abs(float(L1Loss()(jnp.asarray(pred), jnp.asarray(target))) -
               float(F_t.l1_loss(tp, tt))) < 1e-6
    assert abs(float(MSELoss()(jnp.asarray(pred), jnp.asarray(target))) -
               float(F_t.mse_loss(tp, tt))) < 1e-6
    # reference CharbonnierLoss: sqrt(diff^2 + eps), eps default 1e-12
    want = torch.sqrt((tp - tt)**2 + 1e-12).mean()
    assert abs(float(CharbonnierLoss()(jnp.asarray(pred),
                                       jnp.asarray(target))) -
               float(want)) < 1e-6


def test_weighted_tv_loss():
    pred = jnp.asarray(RNG.rand(1, 4, 4, 3).astype(np.float32))
    loss = WeightedTVLoss(loss_weight=1.0, reduction='mean')
    assert np.asarray(loss(pred, weight=None)).shape == ()
    weight = jnp.asarray(RNG.rand(1, 4, 4, 3).astype(np.float32))
    assert np.asarray(loss(pred, weight=weight)).shape == ()
    loss = WeightedTVLoss(loss_weight=1.0, reduction='sum')
    assert np.asarray(loss(pred, weight=weight)).shape == ()
    with pytest.raises(ValueError):
        WeightedTVLoss(loss_weight=1.0, reduction='unknown')
    with pytest.raises(ValueError):
        WeightedTVLoss(loss_weight=1.0, reduction='none')


@pytest.mark.parametrize('gan_type', ['vanilla', 'lsgan', 'wgan',
                                      'wgan_softplus', 'hinge'])
def test_gan_loss_matches_torch(gan_type):
    x = torch.from_numpy((RNG.rand(4, 5).astype(np.float32) - 0.5) * 4)
    jx = jnp.asarray(x.numpy())
    mine = GANLoss(gan_type, loss_weight=1.0)
    for target_is_real in (True, False):
        for is_disc in (True, False):
            got = float(mine(jx, target_is_real, is_disc=is_disc))
            if gan_type == 'vanilla':
                t = torch.full_like(x, 1.0 if target_is_real else 0.0)
                want = F_t.binary_cross_entropy_with_logits(x, t)
            elif gan_type == 'lsgan':
                t = torch.full_like(x, 1.0 if target_is_real else 0.0)
                want = F_t.mse_loss(x, t)
            elif gan_type == 'wgan':
                want = -x.mean() if target_is_real else x.mean()
            elif gan_type == 'wgan_softplus':
                want = F_t.softplus(-x).mean() if target_is_real \
                    else F_t.softplus(x).mean()
            else:  # hinge (reference losses.py:338-346)
                if is_disc:
                    xx = -x if target_is_real else x
                    want = torch.nn.ReLU()(1 + xx).mean()
                else:
                    want = -x.mean()
            assert abs(got - float(want)) < 1e-6, (
                gan_type, target_is_real, is_disc)

    with pytest.raises(NotImplementedError):
        GANLoss('unknown')


def test_masked_tv_loss_default_mask():
    """Regression: the documented mask=None default crashed (the
    reference's own latent bug); it must fall back to unweighted TV."""
    from mrefsr_tpu.losses.legacy_losses import MaskedTVLoss
    pred = jnp.asarray(RNG.rand(1, 5, 5, 2).astype(np.float32))
    out = float(MaskedTVLoss()(pred))
    y = np.abs(np.diff(np.asarray(pred), axis=1)).mean()
    x = np.abs(np.diff(np.asarray(pred), axis=2)).mean()
    assert abs(out - (x + y)) < 1e-6
    # masked form still works
    mask = jnp.ones((1, 5, 5, 2), jnp.float32)
    assert np.isfinite(float(MaskedTVLoss()(pred, mask)))


def test_texture_loss_nondict_weights_branch():
    """Regression: the non-dict weights branch skipped the +1 replicate
    pad the reference applies once before the per-layer upscale
    (models/losses.py:490-491) and used bilinear instead of bicubic
    align_corners=True (:511-512). The swap-confidence map is natively
    the valid 3x3 patch grid, (h3-2, w3-2) at the relu3_1 scale — the
    pad is what makes each level's upscale fit its feature map, so
    without it the coeff multiply shape-errors."""
    import jax

    from mrefsr_tpu.losses.legacy_losses import TextureLoss

    s = 6  # relu3_1 feature size for a 24x24 input
    x = jnp.asarray(RNG.rand(1, 24, 24, 3).astype(np.float32))
    loss = TextureLoss(use_weights=True, loss_weight=1.0)
    vgg_vars = loss.vgg.init(jax.random.PRNGKey(0), x)
    feats = loss.vgg.apply(vgg_vars, x)
    maps = {k: jnp.asarray(RNG.rand(*v.shape).astype(np.float32))
            for k, v in feats.items()}
    w = RNG.rand(1, s - 2, s - 2, 1).astype(np.float32)
    got = float(loss(x, maps, vgg_vars, weights=jnp.asarray(w)))
    assert np.isfinite(got)
    # the dict form with per-level valid-grid maps also runs
    wd = {k: jnp.asarray(
        RNG.rand(1, v.shape[1] - 2, v.shape[2] - 2, 1).astype(np.float32))
        for k, v in feats.items()}
    got_d = float(loss(x, maps, vgg_vars, weights=wd))
    assert np.isfinite(got_d)
