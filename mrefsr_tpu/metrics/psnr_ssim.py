"""PSNR / SSIM — MATLAB-compatible numpy versions + batched jax versions.

Rebuild of reference basicsr/metrics/psnr_ssim.py. The numpy
``calculate_psnr``/``calculate_ssim`` are the parity-critical functions
used by every validation loop (BGR uint8 [0,255] images, optional BT.601
Y-channel, crop_border). The ``*_jax`` variants replace the reference's
``*_pt`` GPU versions (psnr_ssim.py:52-81,133-233): NHWC [0,1] jax arrays,
suitable for on-device validation without host round-trips.
"""
import cv2
import numpy as np

from mrefsr_tpu.metrics.metric_util import reorder_image, to_y_channel
from mrefsr_tpu.utils.color_util import rgb2ycbcr_jax
from mrefsr_tpu.utils.registry import METRIC_REGISTRY


@METRIC_REGISTRY.register()
def calculate_psnr(img, img2, crop_border, input_order='HWC',
                   test_y_channel=False, **kwargs):
    """PSNR on [0,255] images (reference psnr_ssim.py:11-48)."""
    assert img.shape == img2.shape, (
        f'Image shapes are different: {img.shape}, {img2.shape}.')
    if input_order not in ['HWC', 'CHW']:
        raise ValueError(f'Wrong input_order {input_order}. Supported '
                         'input_orders are "HWC" and "CHW"')
    img = reorder_image(img, input_order=input_order)
    img2 = reorder_image(img2, input_order=input_order)

    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]

    if test_y_channel:
        img = to_y_channel(img)
        img2 = to_y_channel(img2)

    img = img.astype(np.float64)
    img2 = img2.astype(np.float64)

    mse = np.mean((img - img2)**2)
    if mse == 0:
        return float('inf')
    return 10. * np.log10(255. * 255. / mse)


def _ssim(img, img2):
    """Single-channel SSIM, MATLAB-window semantics
    (reference psnr_ssim.py:172-200)."""
    c1 = (0.01 * 255)**2
    c2 = (0.03 * 255)**2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    mu1 = cv2.filter2D(img, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq = mu1**2
    mu2_sq = mu2**2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = cv2.filter2D(img**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return ssim_map.mean()


@METRIC_REGISTRY.register()
def calculate_ssim(img, img2, crop_border, input_order='HWC',
                   test_y_channel=False, **kwargs):
    """SSIM on [0,255] images, averaged over channels
    (reference psnr_ssim.py:84-129)."""
    assert img.shape == img2.shape, (
        f'Image shapes are different: {img.shape}, {img2.shape}.')
    if input_order not in ['HWC', 'CHW']:
        raise ValueError(f'Wrong input_order {input_order}. Supported '
                         'input_orders are "HWC" and "CHW"')
    img = reorder_image(img, input_order=input_order)
    img2 = reorder_image(img2, input_order=input_order)

    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]

    if test_y_channel:
        img = to_y_channel(img)
        img2 = to_y_channel(img2)

    img = img.astype(np.float64)
    img2 = img2.astype(np.float64)

    ssims = []
    for i in range(img.shape[2]):
        ssims.append(_ssim(img[..., i], img2[..., i]))
    return np.array(ssims).mean()


# ---------------------------------------------------------------------------
# Device-side (jax) variants — replace the reference's *_pt GPU versions.
# Inputs: NHWC float arrays in [0,1], RGB channel order.
# ---------------------------------------------------------------------------

@METRIC_REGISTRY.register()
def calculate_psnr_jax(img, img2, crop_border, test_y_channel=False,
                       **kwargs):
    """Batched PSNR on NHWC [0,1] arrays (reference psnr_ssim.py:52-81)."""
    import jax.numpy as jnp
    assert img.shape == img2.shape, (
        f'Image shapes are different: {img.shape}, {img2.shape}.')
    if crop_border != 0:
        img = img[:, crop_border:-crop_border, crop_border:-crop_border, :]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border, :]
    if test_y_channel:
        img = rgb2ycbcr_jax(img, y_only=True)
        img2 = rgb2ycbcr_jax(img2, y_only=True)
    img = img.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    mse = jnp.mean((img - img2)**2, axis=(1, 2, 3))
    return 10. * jnp.log10(1. / (mse + 1e-8))


def _gaussian_window_11():
    kernel = cv2.getGaussianKernel(11, 1.5)
    return np.outer(kernel, kernel.transpose()).astype(np.float64)


@METRIC_REGISTRY.register()
def calculate_ssim_jax(img, img2, crop_border, test_y_channel=False,
                       **kwargs):
    """Batched SSIM on NHWC [0,1] arrays (reference psnr_ssim.py:133-233).

    Per-channel valid-mode Gaussian filtering via depthwise conv.
    """
    import jax.numpy as jnp
    from jax import lax
    assert img.shape == img2.shape, (
        f'Image shapes are different: {img.shape}, {img2.shape}.')
    if crop_border != 0:
        img = img[:, crop_border:-crop_border, crop_border:-crop_border, :]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border, :]
    if test_y_channel:
        img = rgb2ycbcr_jax(img, y_only=True)
        img2 = rgb2ycbcr_jax(img2, y_only=True)

    img = img.astype(jnp.float32) * 255.
    img2 = img2.astype(jnp.float32) * 255.

    c = img.shape[-1]
    window = jnp.asarray(_gaussian_window_11(), dtype=img.dtype)
    # depthwise HWIO kernel: (11, 11, 1, c) with feature_group_count=c
    window = jnp.tile(window[:, :, None, None], (1, 1, 1, c))

    def filt(x):
        return lax.conv_general_dilated(
            x, window, window_strides=(1, 1), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=c)

    c1 = (0.01 * 255)**2
    c2 = (0.03 * 255)**2
    mu1 = filt(img)
    mu2 = filt(img2)
    mu1_sq = mu1**2
    mu2_sq = mu2**2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = filt(img * img) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img * img2) - mu1_mu2

    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map.mean(axis=(1, 2, 3))


# Reference-name aliases so YAML configs written for the torch build
# (`type: calculate_psnr_pt`) keep working. The validation loop hands
# registry metrics HWC BGR uint8 images (tensor2img output), while the
# jax variants take NHWC RGB [0,1] batches — adapt per input rank
# (plain aliasing crashed on the only dispatch that uses the registry).
def _pt_alias(fn):
    def adapter(img, img2, crop_border, test_y_channel=False, **kwargs):
        import jax.numpy as jnp
        if getattr(img, 'ndim', None) == 3:
            a = np.asarray(img)[..., ::-1].astype(np.float32)[None] / 255.
            b = np.asarray(img2)[..., ::-1].astype(
                np.float32)[None] / 255.
            return float(fn(jnp.asarray(a), jnp.asarray(b), crop_border,
                            test_y_channel).mean())
        return fn(img, img2, crop_border, test_y_channel)
    return adapter


METRIC_REGISTRY._do_register('calculate_psnr_pt',
                             _pt_alias(calculate_psnr_jax))
METRIC_REGISTRY._do_register('calculate_ssim_pt',
                             _pt_alias(calculate_ssim_jax))
