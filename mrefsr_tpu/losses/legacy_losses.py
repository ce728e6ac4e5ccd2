"""Legacy loss stack used by the Ref/MultiRef models.

Behavioral rebuild of reference basicsr/models/losses.py (the second,
unregistered loss module the MRefSR models fetch via getattr at
multi_ref_restoration_model.py:17,117-168). Differences from the modern
stack: masked variants, PerceptualLoss defaults norm_img=True (expects
[-1,1] inputs), TextureLoss (SRNTT gram loss with weight maps), MapLoss.

Latent bugs in the reference are not copied: the undefined ``div_num``
when use_weights=False (models/losses.py:497-528) is fixed by always
computing the per-layer divisor; the ``torch.nn.L2loss`` typo (:189)
becomes a working L2.
"""
import jax
import jax.numpy as jnp

from .loss_util import masked_loss
from .losses import (GANLoss, L1Loss, MSELoss, CharbonnierLoss,  # noqa
                     gradient_penalty_loss, gram_mat)
from .losses import PerceptualLoss as _ModernPerceptualLoss


@masked_loss
def l1_loss(pred, target):
    return jnp.abs(pred - target)


@masked_loss
def mse_loss(pred, target):
    return (pred - target)**2


@masked_loss
def charbonnier_loss(pred, target, eps=1e-6):
    return jnp.sqrt((pred - target)**2 + eps)


class MaskedTVLoss(L1Loss):
    """Masked total-variation loss (reference models/losses.py:125-138),
    NHWC."""

    def __init__(self, loss_weight=1.0):
        super().__init__(loss_weight=loss_weight)

    def __call__(self, pred, mask=None):
        # mask=None falls back to unweighted TV (the reference
        # unconditionally subscripts mask and crashes on its own
        # documented default, models/losses.py:133-136)
        y_diff = super().__call__(
            pred[:, :-1, :, :], pred[:, 1:, :, :],
            weight=None if mask is None else mask[:, :-1, :, :])
        x_diff = super().__call__(
            pred[:, :, :-1, :], pred[:, :, 1:, :],
            weight=None if mask is None else mask[:, :, :-1, :])
        return x_diff + y_diff


class PerceptualLoss(_ModernPerceptualLoss):
    """Legacy perceptual loss: adds norm_img (default True — inputs in
    [-1,1] are shifted to [0,1]; reference models/losses.py:141-240)."""

    def __init__(self, layer_weights, vgg_type='vgg19',
                 use_input_norm=True, perceptual_weight=1.0,
                 style_weight=0., norm_img=True, criterion='l1'):
        super().__init__(layer_weights, vgg_type=vgg_type,
                         use_input_norm=use_input_norm,
                         perceptual_weight=perceptual_weight,
                         style_weight=style_weight, criterion=criterion)
        self.norm_img = norm_img

    def __call__(self, x, gt, vgg_variables):
        if self.norm_img:
            x = (x + 1.) * 0.5
            gt = (gt + 1.) * 0.5
        return super().__call__(x, gt, vgg_variables)


class PerceptualLossMultiInputs(PerceptualLoss):
    """Perceptual loss summed over a stacked image axis
    (reference models/losses.py:241-272). x, gt: (B, N, H, W, C)."""

    def __call__(self, x, gt, vgg_variables):
        assert x.shape == gt.shape, (
            'The sizes of input and GT should be the same.')
        total_percep, total_style = 0., 0.
        for i in range(x.shape[1]):
            percep, style = super().__call__(x[:, i], gt[:, i],
                                             vgg_variables)
            total_percep = None if percep is None else total_percep + percep
            total_style = None if style is None else total_style + style
        return total_percep, total_style


class GradientPenaltyLoss:
    """WGAN-GP penalty (reference models/losses.py:402-429).

    Call: (disc_fn, real_data, fake_data, rng, mask=None)."""

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, disc_fn, real_data, fake_data, rng, mask=None):
        batch = real_data.shape[0]
        alpha = jax.random.uniform(rng, (batch, 1, 1, 1), real_data.dtype)
        interpolates = alpha * real_data + (1. - alpha) * fake_data
        gradients = jax.grad(lambda z: disc_fn(z).sum())(interpolates)
        if mask is not None:
            gradients = gradients * mask
        # legacy flattens everything per sample (models/losses.py:396-397)
        flat = gradients.reshape(batch, -1)
        norms = jnp.sqrt((flat**2).sum(1) + 1e-12)
        penalty = ((norms - 1)**2).mean()
        return penalty * self.loss_weight


class TextureLoss:
    """SRNTT texture (gram) loss with optional swap-weight maps
    (reference models/losses.py:430-532).

    Call: (x, maps, vgg_variables, weights=0) where maps is a dict of
    NHWC swapped features per VGG layer.
    """

    _DIV_NUM = {'relu3_1': 256, 'relu2_1': 512, 'relu1_1': 1024}
    _IDX = {'relu3_1': 0, 'relu2_1': 1, 'relu1_1': 2}

    def __init__(self, use_weights=False, loss_weight=1.0,
                 vgg_type='vgg19',
                 layer_weights=None, use_input_norm=True):
        from mrefsr_tpu.archs.vgg_arch import VGGFeatureExtractor
        if layer_weights is None:
            layer_weights = {'relu1_1': 1.0, 'relu2_1': 1.0,
                             'relu3_1': 1.0}
        self.use_weights = use_weights
        self.loss_weight = loss_weight
        self.vgg = VGGFeatureExtractor(
            layer_name_list=tuple(layer_weights.keys()),
            vgg_type=vgg_type, use_input_norm=use_input_norm)

    @staticmethod
    def _gram(features):
        """Unnormalized gram over NHWC (reference :533-540 uses bmm on
        (n, c, hw))."""
        n, h, w, c = features.shape
        f = features.reshape(n, h * w, c)
        return jnp.einsum('npc,npd->ncd', f, f,
                          preferred_element_type=jnp.float32)

    def __call__(self, x, maps, vgg_variables, weights=0):
        input_size = x.shape[2]
        x_features = self.vgg.apply(vgg_variables, x)
        maps = dict(maps)

        # non-dict weights get the same +1 replicate pad as the dict
        # branch, applied ONCE before the per-layer upscale (reference
        # models/losses.py:490-491), and the upscale is bicubic
        # align_corners=True (:511-512)
        if self.use_weights and not isinstance(weights, dict):
            weights = jnp.pad(weights, ((0, 0), (1, 1), (1, 1), (0, 0)),
                              mode='edge')

        losses = 0.
        for k in x_features:
            div_num = self._DIV_NUM[k]
            if self.use_weights:
                idx = self._IDX[k]
                if isinstance(weights, dict):
                    w = jnp.pad(weights[k], ((0, 0), (1, 1), (1, 1),
                                             (0, 0)), mode='edge')
                else:
                    from mrefsr_tpu.ops import interpolate
                    w = interpolate(weights, scale_factor=2**idx,
                                    mode='bicubic', align_corners=True)
                coeff = jax.nn.sigmoid(w * (-20.) + .65)
                maps[k] = maps[k] * coeff
                x_features = dict(x_features)
                x_features[k] = x_features[k] * coeff

            diff = self._gram(x_features[k]) - self._gram(maps[k])
            # float divisor: the Python int (input_size^2*div_num)^2
            # overflows jax's default int32 argument parsing
            losses += jnp.linalg.norm(diff.reshape(-1)) / 4. / (
                float(input_size * input_size * div_num)**2)
        losses = losses / 3.
        return losses * self.loss_weight


class MapLoss:
    """Swapped-feature vs GT VGG feature loss
    (reference models/losses.py:535-594).

    Call: (swapped_features dict, gt, vgg_variables)."""

    def __init__(self, vgg_type='vgg19', map_weight=1.0, criterion='l1'):
        from mrefsr_tpu.archs.vgg_arch import VGGFeatureExtractor
        self.map_weight = map_weight
        self.vgg = VGGFeatureExtractor(
            layer_name_list=('relu3_1', 'relu2_1', 'relu1_1'),
            vgg_type=vgg_type)
        self.criterion_type = criterion
        if criterion == 'l1':
            self.criterion = lambda a, b: jnp.abs(a - b).mean()
        elif criterion == 'l2':
            self.criterion = lambda a, b: ((a - b)**2).mean()
        elif criterion == 'fro':
            self.criterion = None
        else:
            raise NotImplementedError(
                f'{criterion} criterion has not been supported.')

    def __call__(self, swapped_features, gt, vgg_variables):
        gt_features = self.vgg.apply(vgg_variables,
                                     jax.lax.stop_gradient(gt))
        map_loss = 0.
        for k in gt_features:
            if self.criterion_type == 'fro':
                map_loss += jnp.linalg.norm(
                    (swapped_features[k] - gt_features[k]).reshape(-1))
            else:
                map_loss += self.criterion(swapped_features[k],
                                           gt_features[k])
        return map_loss * self.map_weight
