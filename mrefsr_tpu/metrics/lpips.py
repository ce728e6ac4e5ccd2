"""Native LPIPS (Learned Perceptual Image Patch Similarity), VGG variant.

The reference ships only a wrapper around the external torch ``lpips``
package (reference scripts/metrics/calculate_lpips.py:22-24); here the
metric runs natively on the framework's own flax VGG16 tower:

    taps at relu{1_2, 2_2, 3_3, 4_3, 5_3} -> unit-normalize channels
    -> squared difference -> learned non-negative 1x1 'lin' weights
    -> spatial mean -> sum over layers

(richzhang/PerceptualSimilarity LPIPS(net='vgg') semantics; the
official scaling layer shift/scale constants are algebraically the
ImageNet mean/std normalization applied to [-1, 1] inputs, which is
exactly ``VGGFeatureExtractor(use_input_norm=True, range_norm=True)``).

Weights: the learned lin heads come from the official LPIPS ``vgg.pth``
(keys ``lin<k>.model.1.weight``), the trunk from a torchvision
``vgg16`` state dict — both loaded from local paths (no download here);
``load_lpips_variables`` converts them into this module's pytree.
"""
from functools import lru_cache

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mrefsr_tpu.utils.registry import METRIC_REGISTRY

LPIPS_VGG_LAYERS = ('relu1_2', 'relu2_2', 'relu3_3', 'relu4_3',
                    'relu5_3')
LPIPS_VGG_CHNS = (64, 128, 256, 512, 512)
_EPS = 1e-10


class LPIPSVgg(nn.Module):
    """LPIPS distance head over the VGG16 tower. Inputs are NHWC RGB in
    [-1, 1]; returns a (N,) distance."""

    @nn.compact
    def __call__(self, x, y):
        from mrefsr_tpu.archs.vgg_arch import VGGFeatureExtractor
        vgg = VGGFeatureExtractor(
            layer_name_list=LPIPS_VGG_LAYERS, vgg_type='vgg16',
            use_input_norm=True, range_norm=True, name='vgg')
        fx = vgg(x)
        fy = vgg(y)
        total = 0.
        for i, (layer, chns) in enumerate(zip(LPIPS_VGG_LAYERS,
                                              LPIPS_VGG_CHNS)):
            a = _unit_normalize(fx[layer])
            b = _unit_normalize(fy[layer])
            diff = (a - b) ** 2
            w = self.param(f'lin{i}', nn.initializers.ones, (chns,))
            total = total + (diff * w).sum(-1).mean(axis=(1, 2))
        return total


def _unit_normalize(feat):
    """lpips.normalize_tensor: unit L2 norm over channels (eps added to
    the norm, not the squared sum)."""
    norm = jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True))
    return feat / (norm + _EPS)


def load_lpips_variables(lpips_path, vgg16_path):
    """Build LPIPSVgg variables from the official checkpoints (local
    files): ``vgg.pth`` from richzhang/PerceptualSimilarity (lin heads)
    and a torchvision ``vgg16`` state dict (trunk)."""
    from mrefsr_tpu.archs.vgg_arch import vgg_rename
    from mrefsr_tpu.convert import load_torch_state_dict, torch_to_flax

    vgg_sd = load_torch_state_dict(vgg16_path, param_key=None)
    trunk = torch_to_flax(vgg_sd, rename=vgg_rename('vgg16'))['params']

    lin_sd = load_torch_state_dict(lpips_path, param_key=None)
    params = {'vgg': trunk}
    for i in range(len(LPIPS_VGG_LAYERS)):
        key = f'lin{i}.model.1.weight'
        w = np.asarray(lin_sd[key], np.float32).reshape(-1)  # (1,C,1,1)
        params[f'lin{i}'] = jnp.asarray(w)
    return {'params': params}


@lru_cache(maxsize=2)
def _jitted_lpips():
    model = LPIPSVgg()
    return jax.jit(lambda v, x, y: model.apply(v, x, y))


_VARIABLES_CACHE = {}


@METRIC_REGISTRY.register()
def calculate_lpips(img, img2, crop_border=0, input_order='HWC',
                    lpips_weights=None, vgg16_weights=None, **kwargs):
    """LPIPS between two [0, 255] uint8/float images (lower is better).

    ``lpips_weights`` / ``vgg16_weights`` are local paths to the
    official checkpoints (see load_lpips_variables). Matches the
    reference wrapper's preprocessing (scripts/metrics/
    calculate_lpips.py:25-47): RGB, [0,1] -> normalized to [-1,1].
    """
    if lpips_weights is None or vgg16_weights is None:
        raise ValueError(
            'calculate_lpips needs lpips_weights (official LPIPS '
            'vgg.pth) and vgg16_weights (torchvision vgg16 state dict) '
            'paths — this environment has no model downloads.')
    assert img.shape == img2.shape, (
        f'Image shapes are different: {img.shape}, {img2.shape}.')
    from .metric_util import reorder_image
    img = reorder_image(img, input_order=input_order).astype(np.float32)
    img2 = reorder_image(img2, input_order=input_order).astype(
        np.float32)
    # registry metrics receive BGR (tensor2img output; same convention
    # as to_y_channel in the sibling metrics) — LPIPS's VGG tower needs
    # RGB like the reference wrapper's img2tensor(..., bgr2rgb=True)
    img = img[..., ::-1]
    img2 = img2[..., ::-1]
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]

    key = (lpips_weights, vgg16_weights)
    if key not in _VARIABLES_CACHE:
        _VARIABLES_CACHE[key] = load_lpips_variables(*key)
    variables = _VARIABLES_CACHE[key]

    # [0,255] -> [-1,1] (reference wrapper normalizes with mean/std 0.5)
    x = jnp.asarray(img[None] / 255. * 2. - 1.)
    y = jnp.asarray(img2[None] / 255. * 2. - 1.)
    return float(_jitted_lpips()(variables, x, y)[0])
