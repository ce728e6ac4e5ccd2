"""Loss library (modern registry stack), jax/NHWC.

Behavioral rebuild of reference basicsr/losses/losses.py. Losses are
plain callables over jax arrays; VGG-based losses carry a flax
VGGFeatureExtractor and take its variables as a call argument (the model
layer owns/loads them), keeping the train step purely functional.
"""
import math
from functools import partial

import jax
import jax.numpy as jnp

from mrefsr_tpu.utils.registry import LOSS_REGISTRY

from .loss_util import weighted_loss

_reduction_modes = ['none', 'mean', 'sum']


@weighted_loss
def l1_loss(pred, target):
    return jnp.abs(pred - target)


@weighted_loss
def mse_loss(pred, target):
    return (pred - target)**2


@weighted_loss
def charbonnier_loss(pred, target, eps=1e-12):
    return jnp.sqrt((pred - target)**2 + eps)


def _check_reduction(reduction):
    if reduction not in _reduction_modes:
        raise ValueError(f'Unsupported reduction mode: {reduction}. '
                         f'Supported ones are: {_reduction_modes}')


@LOSS_REGISTRY.register()
class L1Loss:
    """L1 loss (reference losses.py:30-55)."""

    def __init__(self, loss_weight=1.0, reduction='mean'):
        _check_reduction(reduction)
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * l1_loss(pred, target, weight,
                                          reduction=self.reduction)


@LOSS_REGISTRY.register()
class MSELoss:
    """MSE loss (reference losses.py:58-83)."""

    def __init__(self, loss_weight=1.0, reduction='mean'):
        _check_reduction(reduction)
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * mse_loss(pred, target, weight,
                                           reduction=self.reduction)


@LOSS_REGISTRY.register()
class CharbonnierLoss:
    """Charbonnier loss (reference losses.py:86-118)."""

    def __init__(self, loss_weight=1.0, reduction='mean', eps=1e-12):
        _check_reduction(reduction)
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.eps = eps

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * charbonnier_loss(
            pred, target, weight, eps=self.eps, reduction=self.reduction)


@LOSS_REGISTRY.register()
class WeightedTVLoss(L1Loss):
    """Weighted total-variation loss (reference losses.py:120-146).
    NHWC: spatial axes are 1, 2."""

    def __init__(self, loss_weight=1.0, reduction='mean'):
        if reduction not in ['mean', 'sum']:
            raise ValueError(f'Unsupported reduction mode: {reduction}. '
                             'Supported ones are: mean | sum')
        super().__init__(loss_weight=loss_weight, reduction=reduction)

    def __call__(self, pred, weight=None):
        if weight is None:
            y_weight = x_weight = None
        else:
            y_weight = weight[:, :-1, :, :]
            x_weight = weight[:, :, :-1, :]
        y_diff = super().__call__(pred[:, :-1, :, :], pred[:, 1:, :, :],
                                  weight=y_weight)
        x_diff = super().__call__(pred[:, :, :-1, :], pred[:, :, 1:, :],
                                  weight=x_weight)
        return x_diff + y_diff


def gram_mat(x):
    """Normalized Gram matrix of NHWC features
    (reference losses.py:245-258)."""
    n, h, w, c = x.shape
    feats = x.reshape(n, h * w, c)
    gram = jnp.einsum('npc,npd->ncd', feats, feats,
                      preferred_element_type=jnp.float32)
    return gram / (c * h * w)


@LOSS_REGISTRY.register()
class PerceptualLoss:
    """Perceptual + style loss over VGG taps (reference losses.py:149-258).

    Call signature: ``loss(x, gt, vgg_variables)`` — the model layer loads
    the VGG weights (vgg_pretrain_path option) and passes them in.
    """

    def __init__(self, layer_weights, vgg_type='vgg19', use_input_norm=True,
                 range_norm=False, perceptual_weight=1.0, style_weight=0.,
                 criterion='l1'):
        from mrefsr_tpu.archs.vgg_arch import VGGFeatureExtractor
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.layer_weights = dict(layer_weights)
        self.vgg = VGGFeatureExtractor(
            layer_name_list=tuple(layer_weights.keys()), vgg_type=vgg_type,
            use_input_norm=use_input_norm, range_norm=range_norm)
        self.criterion_type = criterion
        if criterion == 'l1':
            self.criterion = lambda a, b: jnp.abs(a - b).mean()
        elif criterion == 'l2':
            # the reference's 'l2' branch is a latent AttributeError
            # (torch.nn.L2loss, losses.py:189); implement the intent
            self.criterion = lambda a, b: ((a - b)**2).mean()
        elif criterion == 'fro':
            self.criterion = None
        else:
            raise NotImplementedError(
                f'{criterion} criterion has not been supported.')

    def __call__(self, x, gt, vgg_variables):
        x_features = self.vgg.apply(vgg_variables, x)
        gt_features = self.vgg.apply(vgg_variables,
                                     jax.lax.stop_gradient(gt))

        percep_loss = None
        if self.perceptual_weight > 0:
            percep_loss = 0.
            for k in x_features:
                if self.criterion_type == 'fro':
                    percep_loss += jnp.linalg.norm(
                        (x_features[k] - gt_features[k]).reshape(-1)
                    ) * self.layer_weights[k]
                else:
                    percep_loss += self.criterion(
                        x_features[k], gt_features[k]) * self.layer_weights[k]
            percep_loss *= self.perceptual_weight

        style_loss = None
        if self.style_weight > 0:
            style_loss = 0.
            for k in x_features:
                gx = gram_mat(x_features[k])
                gg = gram_mat(gt_features[k])
                if self.criterion_type == 'fro':
                    style_loss += jnp.linalg.norm(
                        (gx - gg).reshape(-1)) * self.layer_weights[k]
                else:
                    style_loss += self.criterion(gx, gg) * \
                        self.layer_weights[k]
            style_loss *= self.style_weight

        return percep_loss, style_loss


@LOSS_REGISTRY.register()
class GANLoss:
    """GAN loss: vanilla / lsgan / wgan / wgan_softplus / hinge
    (reference losses.py:259-361)."""

    def __init__(self, gan_type, real_label_val=1.0, fake_label_val=0.0,
                 loss_weight=1.0):
        self.gan_type = gan_type
        self.loss_weight = loss_weight
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        if gan_type not in ('vanilla', 'lsgan', 'wgan', 'wgan_softplus',
                            'hinge'):
            raise NotImplementedError(
                f'GAN type {gan_type} is not implemented.')

    def _base_loss(self, x, target_is_real):
        if self.gan_type == 'vanilla':
            t = self.real_label_val if target_is_real else \
                self.fake_label_val
            # BCE with logits
            return jnp.mean(jnp.maximum(x, 0) - x * t +
                            jnp.log1p(jnp.exp(-jnp.abs(x))))
        if self.gan_type == 'lsgan':
            t = self.real_label_val if target_is_real else \
                self.fake_label_val
            return jnp.mean((x - t)**2)
        if self.gan_type == 'wgan':
            return -x.mean() if target_is_real else x.mean()
        if self.gan_type == 'wgan_softplus':
            return jax.nn.softplus(-x).mean() if target_is_real \
                else jax.nn.softplus(x).mean()
        raise AssertionError

    def __call__(self, x, target_is_real, is_disc=False):
        if self.gan_type == 'hinge':
            if is_disc:
                x = -x if target_is_real else x
                loss = jax.nn.relu(1 + x).mean()
            else:
                loss = -x.mean()
        else:
            loss = self._base_loss(x, target_is_real)
        return loss if is_disc else loss * self.loss_weight


@LOSS_REGISTRY.register()
class MultiScaleGANLoss(GANLoss):
    """GAN loss over a list of multi-scale predictions
    (reference losses.py:364-388)."""

    def __call__(self, x, target_is_real, is_disc=False):
        if isinstance(x, list):
            loss = 0.
            for pred_i in x:
                if isinstance(pred_i, list):
                    pred_i = pred_i[-1]
                loss += super().__call__(pred_i, target_is_real,
                                         is_disc).mean()
            return loss / len(x)
        return super().__call__(x, target_is_real, is_disc)


def r1_penalty(disc_fn, real_img):
    """R1 gradient penalty on real data (reference losses.py:391-405).

    disc_fn: real_img -> predictions; differentiated with jax.grad.
    """
    grad_real = jax.grad(lambda img: disc_fn(img).sum())(real_img)
    return (grad_real.reshape(grad_real.shape[0], -1)**2).sum(1).mean()


def g_path_regularize(fake_img_fn, latents, mean_path_length, rng,
                      decay=0.01):
    """StyleGAN2 path-length regularization (reference losses.py:408-417).

    fake_img_fn: latents -> image (differentiable).
    """
    fake_img = fake_img_fn(latents)
    noise = jax.random.normal(rng, fake_img.shape, fake_img.dtype) / \
        math.sqrt(fake_img.shape[1] * fake_img.shape[2])
    grad = jax.grad(
        lambda z: (fake_img_fn(z) * noise).sum())(latents)
    path_lengths = jnp.sqrt((grad**2).sum(-1).mean(-1))
    path_mean = mean_path_length + decay * (
        path_lengths.mean() - mean_path_length)
    path_penalty = ((path_lengths - path_mean)**2).mean()
    return path_penalty, jax.lax.stop_gradient(path_lengths.mean()), \
        jax.lax.stop_gradient(path_mean)


def gradient_penalty_loss(disc_fn, real_data, fake_data, rng, weight=None):
    """WGAN-GP gradient penalty (reference losses.py:420-456).

    disc_fn: images -> predictions. The interpolation alpha is drawn from
    ``rng`` (replaces torch.rand)."""
    batch = real_data.shape[0]
    alpha = jax.random.uniform(rng, (batch, 1, 1, 1), real_data.dtype)
    interpolates = alpha * real_data + (1. - alpha) * fake_data

    gradients = jax.grad(lambda z: disc_fn(z).sum())(interpolates)
    if weight is not None:
        gradients = gradients * weight
    # reference norms over the channel axis only (losses.py:452)
    norms = jnp.sqrt((gradients**2).sum(axis=-1) + 1e-12)
    penalty = ((norms - 1)**2).mean()
    if weight is not None:
        penalty = penalty / weight.mean()
    return penalty


@LOSS_REGISTRY.register()
class GANFeatLoss:
    """Feature-matching loss over multi-discriminator taps
    (reference losses.py:460-492)."""

    def __init__(self, criterion='l1', loss_weight=1.0, reduction='mean'):
        if criterion == 'l1':
            self.loss_op = L1Loss(loss_weight, reduction)
        elif criterion == 'l2':
            self.loss_op = MSELoss(loss_weight, reduction)
        elif criterion == 'charbonnier':
            self.loss_op = CharbonnierLoss(loss_weight, reduction)
        else:
            raise ValueError(f'Unsupported loss mode: {criterion}. '
                             'Supported ones are: l1|l2|charbonnier')
        self.loss_weight = loss_weight

    def __call__(self, pred_fake, pred_real):
        num_d = len(pred_fake)
        loss = 0.
        for i in range(num_d):
            num_intermediate = len(pred_fake[i]) - 1
            for j in range(num_intermediate):
                unweighted = self.loss_op(
                    pred_fake[i][j],
                    jax.lax.stop_gradient(pred_real[i][j]))
                loss += unweighted / num_d
        return loss * self.loss_weight
