"""USM sharpening + per-sample filter2D
(reference basicsr/utils/img_process_util.py).

The device tier is jnp/NHWC and jit-traceable: ``filter2D`` folds the
batch into conv feature groups (one grouped ``lax.conv`` call instead of
the reference's view/repeat dance), so per-sample blur kernels in the
RealESRGAN degradation pipeline run as a single fused TPU conv.
"""
import cv2
import jax
import jax.numpy as jnp
import numpy as np


def filter2D(img, kernel):
    """Per-sample 2D correlation with reflect padding, NHWC
    (reference img_process_util.py:7-32, there NCHW).

    Args:
        img: (b, h, w, c) float array.
        kernel: (b, k, k) or (1, k, k) float array.
    """
    k = kernel.shape[-1]
    if k % 2 != 1:
        raise ValueError('Wrong kernel size')
    b, h, w, c = img.shape
    pad = k // 2
    img = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                  mode='reflect')
    if kernel.shape[0] == 1 and b != 1:
        kernel = jnp.broadcast_to(kernel, (b, k, k))
    # fold batch into channels: lhs (1, ph, pw, b*c), rhs (k, k, 1, b*c),
    # feature_group_count=b*c -> per-(sample,channel) planar correlation.
    ph, pw = h + 2 * pad, w + 2 * pad
    lhs = jnp.transpose(img, (1, 2, 0, 3)).reshape(1, ph, pw, b * c)
    rhs = jnp.repeat(kernel[:, None], c, axis=1)  # (b, c, k, k)
    rhs = jnp.transpose(rhs, (2, 3, 0, 1)).reshape(k, k, 1, b * c)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=b * c)
    return jnp.transpose(out.reshape(h, w, b, c), (2, 0, 1, 3))


def usm_sharp(img, weight=0.5, radius=50, threshold=10):
    """Host-side USM sharpening on an HWC BGR [0,1] numpy image
    (reference img_process_util.py:34-60)."""
    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = (np.abs(residual) * 255 > threshold).astype('float32')
    soft_mask = cv2.GaussianBlur(mask, (radius, radius), 0)
    sharp = np.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img


class USMSharp:
    """Batched on-device USM sharpening, NHWC
    (reference img_process_util.py:63-83). Stateless pytree-free
    callable; the Gaussian kernel is a baked constant so calls trace
    cleanly into the jitted train step."""

    def __init__(self, radius=50, sigma=0):
        if radius % 2 == 0:
            radius += 1
        self.radius = radius
        kernel = cv2.getGaussianKernel(radius, sigma)
        self.kernel = jnp.asarray(
            np.dot(kernel, kernel.transpose()), jnp.float32)[None]

    def __call__(self, img, weight=0.5, threshold=10):
        blur = filter2D(img, self.kernel)
        residual = img - blur
        mask = (jnp.abs(residual) * 255 > threshold).astype(img.dtype)
        soft_mask = filter2D(mask, self.kernel)
        sharp = jnp.clip(img + weight * residual, 0, 1)
        return soft_mask * sharp + (1 - soft_mask) * img
