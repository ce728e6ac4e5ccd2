"""NIQE (Natural Image Quality Evaluator)
(reference basicsr/metrics/niqe.py:13-197). Pure numpy/scipy, using the
official pristine-MVG parameters (``niqe_pris_params.npz``, the LIVE-lab
release artifact the reference also ships).
"""
import math
import os

import cv2
import numpy as np
from scipy.ndimage import convolve
from scipy.special import gamma

from mrefsr_tpu.utils.matlab_functions import imresize
from mrefsr_tpu.utils.registry import METRIC_REGISTRY

from .metric_util import reorder_image, to_y_channel


def _pris_params():
    """Pristine-MVG parameters, loaded once (validation calls
    calculate_niqe per image — reloading the npz each call is pure IO
    overhead, a flaw inherited from the reference)."""
    global _PRIS_CACHE
    if _PRIS_CACHE is None:
        root_dir = os.path.dirname(os.path.abspath(__file__))
        f = np.load(os.path.join(root_dir, 'niqe_pris_params.npz'))
        _PRIS_CACHE = (f['mu_pris_param'], f['cov_pris_param'],
                       f['gaussian_window'])
    return _PRIS_CACHE


_PRIS_CACHE = None


def estimate_aggd_param(block):
    """Fit AGGD params (alpha, beta_l, beta_r) to a block
    (reference niqe.py:13-38)."""
    block = block.flatten()
    gam = np.arange(0.2, 10.001, 0.001)
    gam_reciprocal = np.reciprocal(gam)
    r_gam = np.square(gamma(gam_reciprocal * 2)) / (
        gamma(gam_reciprocal) * gamma(gam_reciprocal * 3))

    left_std = np.sqrt(np.mean(block[block < 0]**2))
    right_std = np.sqrt(np.mean(block[block > 0]**2))
    gammahat = left_std / right_std
    rhat = (np.mean(np.abs(block)))**2 / np.mean(block**2)
    rhatnorm = (rhat * (gammahat**3 + 1) *
                (gammahat + 1)) / ((gammahat**2 + 1)**2)
    array_position = np.argmin((r_gam - rhatnorm)**2)

    alpha = gam[array_position]
    beta_l = left_std * np.sqrt(gamma(1 / alpha) / gamma(3 / alpha))
    beta_r = right_std * np.sqrt(gamma(1 / alpha) / gamma(3 / alpha))
    return alpha, beta_l, beta_r


def compute_feature(block):
    """18 NIQE features per block (reference niqe.py:41-66)."""
    feat = []
    alpha, beta_l, beta_r = estimate_aggd_param(block)
    feat.extend([alpha, (beta_l + beta_r) / 2])
    for shift in ([0, 1], [1, 0], [1, 1], [1, -1]):
        shifted_block = np.roll(block, shift, axis=(0, 1))
        alpha, beta_l, beta_r = estimate_aggd_param(block * shifted_block)
        mean = (beta_r - beta_l) * (gamma(2 / alpha) / gamma(1 / alpha))
        feat.extend([alpha, mean, beta_l, beta_r])
    return feat


def niqe(img, mu_pris_param, cov_pris_param, gaussian_window,
         block_size_h=96, block_size_w=96):
    """NIQE core: multiscale MSCN AGGD features vs the pristine MVG
    (reference niqe.py:69-140)."""
    assert img.ndim == 2, (
        'Input image must be a gray or Y (of YCbCr) image with shape '
        '(h, w).')
    h, w = img.shape
    num_block_h = math.floor(h / block_size_h)
    num_block_w = math.floor(w / block_size_w)
    img = img[0:num_block_h * block_size_h, 0:num_block_w * block_size_w]

    distparam = []
    for scale in (1, 2):
        mu = convolve(img, gaussian_window, mode='nearest')
        sigma = np.sqrt(np.abs(
            convolve(np.square(img), gaussian_window, mode='nearest')
            - np.square(mu)))
        img_normalized = (img - mu) / (sigma + 1)

        feat = []
        for idx_w in range(num_block_w):
            for idx_h in range(num_block_h):
                block = img_normalized[
                    idx_h * block_size_h // scale:
                    (idx_h + 1) * block_size_h // scale,
                    idx_w * block_size_w // scale:
                    (idx_w + 1) * block_size_w // scale]
                feat.append(compute_feature(block))
        distparam.append(np.array(feat))

        if scale == 1:
            img = imresize(img / 255., scale=0.5, antialiasing=True)
            img = img * 255.

    distparam = np.concatenate(distparam, axis=1)

    mu_distparam = np.nanmean(distparam, axis=0)
    distparam_no_nan = distparam[~np.isnan(distparam).any(axis=1)]
    cov_distparam = np.cov(distparam_no_nan, rowvar=False)

    invcov_param = np.linalg.pinv((cov_pris_param + cov_distparam) / 2)
    quality = np.matmul(
        np.matmul((mu_pris_param - mu_distparam), invcov_param),
        np.transpose(mu_pris_param - mu_distparam))
    return float(np.squeeze(np.sqrt(quality)))


@METRIC_REGISTRY.register()
def calculate_niqe(img, crop_border, input_order='HWC', convert_to='y',
                   **kwargs):
    """NIQE entry (reference niqe.py:143-197): BGR uint8-range input,
    Y/gray conversion, MATLAB-consistent rounding."""
    mu_pris_param, cov_pris_param, gaussian_window = _pris_params()

    img = img.astype(np.float32)
    if input_order != 'HW':
        img = reorder_image(img, input_order=input_order)
        if convert_to == 'y':
            img = to_y_channel(img)
        elif convert_to == 'gray':
            img = cv2.cvtColor(img / 255., cv2.COLOR_BGR2GRAY) * 255.
        img = np.squeeze(img)

    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border]

    img = img.round()
    return niqe(img, mu_pris_param, cov_pris_param, gaussian_window)
