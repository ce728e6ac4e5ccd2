"""Blind-SR degradation synthesis (reference basicsr/data/degradations.py).

Two tiers, mirroring the reference's numpy/torch split but TPU-native:

* **Host tier (numpy)** — blur-kernel samplers and per-image noise used
  inside dataset ``__getitem__`` on the CPU loader threads
  (reference degradations.py:16-417, 420-458, 560-608, 732-765).
* **Device tier (jnp)** — batched noise generators with explicit JAX PRNG
  keys, NHWC layout, jit-traceable (reference's ``*_pt`` functions at
  degradations.py:461-556, 610-729). These run *inside* the jitted
  train step of RealESRGAN/RealESRNet models so the whole two-stage
  degradation pipeline stays on-chip and fuses with the forward pass.
"""
import math
import random

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from scipy import special
from scipy.stats import multivariate_normal

# ------------------------------------------------------------------ #
# ------------------------- blur kernels -------------------------- #
# ------------------------------------------------------------------ #


def sigma_matrix2(sig_x, sig_y, theta):
    """Rotated 2x2 covariance matrix (reference degradations.py:16-30)."""
    d_matrix = np.array([[sig_x**2, 0], [0, sig_y**2]])
    u_matrix = np.array([[np.cos(theta), -np.sin(theta)],
                         [np.sin(theta), np.cos(theta)]])
    return np.dot(u_matrix, np.dot(d_matrix, u_matrix.T))


def mesh_grid(kernel_size):
    """Zero-centered mesh grid (reference degradations.py:32-47)."""
    ax = np.arange(-kernel_size // 2 + 1., kernel_size // 2 + 1.)
    xx, yy = np.meshgrid(ax, ax)
    xy = np.hstack((xx.reshape((kernel_size * kernel_size, 1)),
                    yy.reshape(kernel_size * kernel_size, 1))).reshape(
                        kernel_size, kernel_size, 2)
    return xy, xx, yy


def pdf2(sigma_matrix, grid):
    """Un-normalized bivariate Gaussian pdf (reference :50-63)."""
    inverse_sigma = np.linalg.inv(sigma_matrix)
    return np.exp(-0.5 * np.sum(np.dot(grid, inverse_sigma) * grid, 2))


def cdf2(d_matrix, grid):
    """Skewed standard bivariate Gaussian cdf (reference :66-81)."""
    rv = multivariate_normal([0, 0], [[1, 0], [0, 1]])
    grid = np.dot(grid, d_matrix)
    return rv.cdf(grid)


def bivariate_Gaussian(kernel_size, sig_x, sig_y, theta, grid=None,
                       isotropic=True):
    """Normalized (an)isotropic Gaussian kernel (reference :84-109)."""
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    kernel = pdf2(sigma_matrix, grid)
    return kernel / np.sum(kernel)


def bivariate_generalized_Gaussian(kernel_size, sig_x, sig_y, theta, beta,
                                   grid=None, isotropic=True):
    """Generalized Gaussian kernel, beta=1 is Gaussian (reference :112-144)."""
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    inverse_sigma = np.linalg.inv(sigma_matrix)
    kernel = np.exp(
        -0.5 * np.power(np.sum(np.dot(grid, inverse_sigma) * grid, 2), beta))
    return kernel / np.sum(kernel)


def bivariate_plateau(kernel_size, sig_x, sig_y, theta, beta, grid=None,
                      isotropic=True):
    """Plateau-shaped kernel 1/(1+x^beta) (reference :147-176)."""
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    inverse_sigma = np.linalg.inv(sigma_matrix)
    kernel = np.reciprocal(
        np.power(np.sum(np.dot(grid, inverse_sigma) * grid, 2), beta) + 1)
    return kernel / np.sum(kernel)


def _sample_sigmas(sigma_x_range, sigma_y_range, rotation_range, isotropic):
    assert sigma_x_range[0] < sigma_x_range[1], 'Wrong sigma_x_range.'
    sigma_x = np.random.uniform(sigma_x_range[0], sigma_x_range[1])
    if isotropic is False:
        assert sigma_y_range[0] < sigma_y_range[1], 'Wrong sigma_y_range.'
        assert rotation_range[0] < rotation_range[1], 'Wrong rotation_range.'
        sigma_y = np.random.uniform(sigma_y_range[0], sigma_y_range[1])
        rotation = np.random.uniform(rotation_range[0], rotation_range[1])
    else:
        sigma_y = sigma_x
        rotation = 0
    return sigma_x, sigma_y, rotation


def _apply_kernel_noise(kernel, noise_range):
    if noise_range is not None:
        assert noise_range[0] < noise_range[1], 'Wrong noise range.'
        noise = np.random.uniform(noise_range[0], noise_range[1],
                                  size=kernel.shape)
        kernel = kernel * noise
    return kernel / np.sum(kernel)


def random_bivariate_Gaussian(kernel_size, sigma_x_range, sigma_y_range,
                              rotation_range, noise_range=None,
                              isotropic=True):
    """Random Gaussian kernel (reference degradations.py:179-220)."""
    assert kernel_size % 2 == 1, 'Kernel size must be an odd number.'
    sigma_x, sigma_y, rotation = _sample_sigmas(
        sigma_x_range, sigma_y_range, rotation_range, isotropic)
    kernel = bivariate_Gaussian(kernel_size, sigma_x, sigma_y, rotation,
                                isotropic=isotropic)
    return _apply_kernel_noise(kernel, noise_range)


def _sample_beta(beta_range):
    # reference :263-267 — half the draws below 1, half above
    if np.random.uniform() < 0.5:
        return np.random.uniform(beta_range[0], 1)
    return np.random.uniform(1, beta_range[1])


def random_bivariate_generalized_Gaussian(kernel_size, sigma_x_range,
                                          sigma_y_range, rotation_range,
                                          beta_range, noise_range=None,
                                          isotropic=True):
    """Random generalized Gaussian kernel (reference :223-272)."""
    assert kernel_size % 2 == 1, 'Kernel size must be an odd number.'
    sigma_x, sigma_y, rotation = _sample_sigmas(
        sigma_x_range, sigma_y_range, rotation_range, isotropic)
    beta = _sample_beta(beta_range)
    kernel = bivariate_generalized_Gaussian(
        kernel_size, sigma_x, sigma_y, rotation, beta, isotropic=isotropic)
    return _apply_kernel_noise(kernel, noise_range)


def random_bivariate_plateau(kernel_size, sigma_x_range, sigma_y_range,
                             rotation_range, beta_range, noise_range=None,
                             isotropic=True):
    """Random plateau kernel (reference :275-324)."""
    assert kernel_size % 2 == 1, 'Kernel size must be an odd number.'
    sigma_x, sigma_y, rotation = _sample_sigmas(
        sigma_x_range, sigma_y_range, rotation_range, isotropic)
    beta = _sample_beta(beta_range)
    kernel = bivariate_plateau(kernel_size, sigma_x, sigma_y, rotation, beta,
                               isotropic=isotropic)
    return _apply_kernel_noise(kernel, noise_range)


def random_mixed_kernels(kernel_list, kernel_prob, kernel_size=21,
                         sigma_x_range=(0.6, 5), sigma_y_range=(0.6, 5),
                         rotation_range=(-math.pi, math.pi),
                         betag_range=(0.5, 8), betap_range=(0.5, 8),
                         noise_range=None):
    """Sample one kernel from the mixed family (reference :327-389)."""
    kernel_type = random.choices(kernel_list, kernel_prob)[0]
    if kernel_type == 'iso':
        kernel = random_bivariate_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            noise_range=noise_range, isotropic=True)
    elif kernel_type == 'aniso':
        kernel = random_bivariate_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            noise_range=noise_range, isotropic=False)
    elif kernel_type == 'generalized_iso':
        kernel = random_bivariate_generalized_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betag_range, noise_range=noise_range, isotropic=True)
    elif kernel_type == 'generalized_aniso':
        kernel = random_bivariate_generalized_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betag_range, noise_range=noise_range, isotropic=False)
    elif kernel_type == 'plateau_iso':
        kernel = random_bivariate_plateau(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betap_range, noise_range=None, isotropic=True)
    elif kernel_type == 'plateau_aniso':
        kernel = random_bivariate_plateau(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betap_range, noise_range=None, isotropic=False)
    else:
        raise ValueError(f'Unknown kernel type {kernel_type}')
    return kernel


def circular_lowpass_kernel(cutoff, kernel_size, pad_to=0):
    """2D sinc (circular lowpass) filter (reference :392-417)."""
    assert kernel_size % 2 == 1, 'Kernel size must be an odd number.'
    with np.errstate(divide='ignore', invalid='ignore'):
        kernel = np.fromfunction(
            lambda x, y: cutoff * special.j1(cutoff * np.sqrt(
                (x - (kernel_size - 1) / 2)**2 +
                (y - (kernel_size - 1) / 2)**2)) / (2 * np.pi * np.sqrt(
                    (x - (kernel_size - 1) / 2)**2 +
                    (y - (kernel_size - 1) / 2)**2)),
            [kernel_size, kernel_size])
    kernel[(kernel_size - 1) // 2,
           (kernel_size - 1) // 2] = cutoff**2 / (4 * np.pi)
    kernel = kernel / np.sum(kernel)
    if pad_to > kernel_size:
        pad_size = (pad_to - kernel_size) // 2
        kernel = np.pad(kernel, ((pad_size, pad_size), (pad_size, pad_size)))
    return kernel


# ------------------------------------------------------------------ #
# ------------------- host (numpy) noise tier --------------------- #
# ------------------------------------------------------------------ #


def _clip_round(out, clip, rounds, xp=np):
    if clip and rounds:
        out = xp.clip((out * 255.0).round(), 0, 255) / 255.
    elif clip:
        out = xp.clip(out, 0, 1)
    elif rounds:
        out = (out * 255.0).round() / 255.
    return out


def generate_gaussian_noise(img, sigma=10, gray_noise=False):
    """HWC [0,1] float32 Gaussian noise (reference :420-437)."""
    if gray_noise:
        noise = np.float32(np.random.randn(*(img.shape[0:2]))) * sigma / 255.
        noise = np.expand_dims(noise, axis=2).repeat(3, axis=2)
    else:
        noise = np.float32(np.random.randn(*(img.shape))) * sigma / 255.
    return noise


def add_gaussian_noise(img, sigma=10, clip=True, rounds=False,
                       gray_noise=False):
    """(reference :439-458)"""
    noise = generate_gaussian_noise(img, sigma, gray_noise)
    return _clip_round(img + noise, clip, rounds)


def random_generate_gaussian_noise(img, sigma_range=(0, 10), gray_prob=0):
    """(reference :516-522)"""
    sigma = np.random.uniform(sigma_range[0], sigma_range[1])
    gray_noise = np.random.uniform() < gray_prob
    return generate_gaussian_noise(img, sigma, gray_noise)


def random_add_gaussian_noise(img, sigma_range=(0, 1.0), gray_prob=0,
                              clip=True, rounds=False):
    """(reference :525-534)"""
    noise = random_generate_gaussian_noise(img, sigma_range, gray_prob)
    return _clip_round(img + noise, clip, rounds)


def generate_poisson_noise(img, scale=1.0, gray_noise=False):
    """Shot noise with unique-value scaling (reference :560-585)."""
    if gray_noise:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    img = np.clip((img * 255.0).round(), 0, 255) / 255.
    vals = len(np.unique(img))
    vals = 2**np.ceil(np.log2(vals))
    out = np.float32(np.random.poisson(img * vals) / float(vals))
    noise = out - img
    if gray_noise:
        noise = np.repeat(noise[:, :, np.newaxis], 3, axis=2)
    return noise * scale


def add_poisson_noise(img, scale=1.0, clip=True, rounds=False,
                      gray_noise=False):
    """(reference :587-608)"""
    noise = generate_poisson_noise(img, scale, gray_noise)
    return _clip_round(img + noise, clip, rounds)


def random_generate_poisson_noise(img, scale_range=(0, 1.0), gray_prob=0):
    """(reference :686-692)"""
    scale = np.random.uniform(scale_range[0], scale_range[1])
    gray_noise = np.random.uniform() < gray_prob
    return generate_poisson_noise(img, scale, gray_noise)


def random_add_poisson_noise(img, scale_range=(0, 1.0), gray_prob=0,
                             clip=True, rounds=False):
    """(reference :695-704)"""
    noise = random_generate_poisson_noise(img, scale_range, gray_prob)
    return _clip_round(img + noise, clip, rounds)


def add_jpg_compression(img, quality=90):
    """Real JPEG round-trip via cv2 (reference :732-749)."""
    img = np.clip(img, 0, 1)
    encode_param = [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)]
    _, encimg = cv2.imencode('.jpg', img * 255., encode_param)
    return np.float32(cv2.imdecode(encimg, 1)) / 255.


def random_add_jpg_compression(img, quality_range=(90, 100)):
    """(reference :751-765)"""
    quality = np.random.uniform(quality_range[0], quality_range[1])
    return add_jpg_compression(img, quality)


# ------------------------------------------------------------------ #
# ---------------- device (jnp, batched NHWC) tier ----------------- #
# ------------------------------------------------------------------ #
# Replaces the reference ``*_pt`` torch functions (:461-556, 610-729).
# All take an explicit PRNG key and NHWC [0,1] float arrays, and are
# fully jit-traceable (static shapes, no host sync) so RealESRGAN-style
# on-device degradation fuses into the train step.

# torchvision grayscale weights. Plain numpy ON PURPOSE: a module-level
# jnp constant initializes the XLA backend at import time, which breaks
# jax.distributed.initialize() in multi-process CLI launches (it must
# run before ANY backend use; tests/test_parallel/test_train_cli_dist.py)
_GRAY_COEFF = np.asarray([0.2989, 0.587, 0.114], np.float32)


def _per_sample(x, b):
    """Broadcast a scalar or per-sample (b,) array to (b,1,1,1)."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 0:
        x = jnp.broadcast_to(x, (b,))
    return x.reshape(b, 1, 1, 1)


def generate_gaussian_noise_jax(key, img, sigma=10, gray_noise=0):
    """Batched Gaussian noise, NHWC (reference *_pt* at :461-490).

    gray_noise is a 0/1 per-sample mask (or scalar prob already drawn);
    unlike the torch version we always compute both branches — on TPU
    the extra randn is cheaper than a host-synced conditional.
    """
    b, h, w, c = img.shape
    sigma = _per_sample(sigma, b)
    gray = _per_sample(gray_noise, b)
    kc, kg = jax.random.split(key)
    noise = jax.random.normal(kc, img.shape, img.dtype) * sigma / 255.
    noise_gray = jax.random.normal(kg, (b, h, w, 1), img.dtype) * sigma / 255.
    return noise * (1 - gray) + noise_gray * gray


def add_gaussian_noise_jax(key, img, sigma=10, gray_noise=0, clip=True,
                           rounds=False):
    """(reference :493-513)"""
    noise = generate_gaussian_noise_jax(key, img, sigma, gray_noise)
    return _clip_round(img + noise, clip, rounds, xp=jnp)


def random_generate_gaussian_noise_jax(key, img, sigma_range=(0, 10),
                                       gray_prob=0):
    """(reference :537-542)"""
    b = img.shape[0]
    ks, kg, kn = jax.random.split(key, 3)
    sigma = jax.random.uniform(ks, (b,), img.dtype, sigma_range[0],
                               sigma_range[1])
    gray_noise = (jax.random.uniform(kg, (b,), img.dtype)
                  < gray_prob).astype(img.dtype)
    return generate_gaussian_noise_jax(kn, img, sigma, gray_noise)


def random_add_gaussian_noise_jax(key, img, sigma_range=(0, 1.0), gray_prob=0,
                                  clip=True, rounds=False):
    """(reference :545-556)"""
    noise = random_generate_gaussian_noise_jax(key, img, sigma_range,
                                               gray_prob)
    return _clip_round(img + noise, clip, rounds, xp=jnp)


def _unique_vals(img, valid_mask=None):
    """Per-sample 2^ceil(log2(#unique levels)) of a [0,1] image quantized
    to 255 levels (reference :627-641 uses a host loop over
    ``torch.unique``; here a 256-bin histogram of the quantized levels
    gives the same count with static shapes — jit-friendly).

    ``valid_mask`` (broadcastable to img, 0/1) restricts the count to
    valid pixels — used by the fixed-canvas degradation pipeline where
    the image occupies only part of the array."""
    b = img.shape[0]
    levels = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.int32)
    flat = levels.reshape(b, -1)
    if valid_mask is None:
        weights = jnp.ones_like(flat)
    else:
        weights = jnp.broadcast_to(valid_mask, img.shape).reshape(
            b, -1).astype(jnp.int32)
    one_hot = jnp.zeros((b, 256), jnp.int32)
    one_hot = jax.vmap(lambda oh, f, m: oh.at[f].add(m))(one_hot, flat,
                                                         weights)
    n_unique = jnp.sum(one_hot > 0, axis=1).astype(jnp.float32)
    vals = 2.0**jnp.ceil(jnp.log2(n_unique))
    return vals.reshape(b, 1, 1, 1)


def generate_poisson_noise_jax(key, img, scale=1.0, gray_noise=0,
                               valid_mask=None):
    """Batched shot noise, NHWC (reference *_pt* at :610-656)."""
    b, h, w, c = img.shape
    gray = _per_sample(gray_noise, b)
    scale = _per_sample(scale, b)
    kc, kg = jax.random.split(key)

    img_q = jnp.clip(jnp.round(img * 255.0), 0, 255) / 255.
    vals = _unique_vals(img_q, valid_mask)
    out = jax.random.poisson(kc, img_q * vals).astype(img.dtype) / vals
    noise = out - img_q

    img_gray = jnp.sum(img * jnp.asarray(_GRAY_COEFF), axis=-1,
                       keepdims=True)
    img_gray = jnp.clip(jnp.round(img_gray * 255.0), 0, 255) / 255.
    vals_g = _unique_vals(img_gray, valid_mask)
    out_g = jax.random.poisson(kg, img_gray * vals_g).astype(
        img.dtype) / vals_g
    noise_gray = jnp.broadcast_to(out_g - img_gray, (b, h, w, c))

    noise = noise * (1 - gray) + noise_gray * gray
    return noise * scale


def add_poisson_noise_jax(key, img, scale=1.0, gray_noise=0, clip=True,
                          rounds=False, valid_mask=None):
    """(reference :658-683)"""
    noise = generate_poisson_noise_jax(key, img, scale, gray_noise,
                                       valid_mask)
    return _clip_round(img + noise, clip, rounds, xp=jnp)


def random_generate_poisson_noise_jax(key, img, scale_range=(0, 1.0),
                                      gray_prob=0, valid_mask=None):
    """(reference :707-712)"""
    b = img.shape[0]
    ks, kg, kn = jax.random.split(key, 3)
    scale = jax.random.uniform(ks, (b,), img.dtype, scale_range[0],
                               scale_range[1])
    gray_noise = (jax.random.uniform(kg, (b,), img.dtype)
                  < gray_prob).astype(img.dtype)
    return generate_poisson_noise_jax(kn, img, scale, gray_noise,
                                      valid_mask)


def random_add_poisson_noise_jax(key, img, scale_range=(0, 1.0), gray_prob=0,
                                 clip=True, rounds=False, valid_mask=None):
    """(reference :715-729)"""
    noise = random_generate_poisson_noise_jax(key, img, scale_range,
                                              gray_prob, valid_mask)
    return _clip_round(img + noise, clip, rounds, xp=jnp)


# Reference-name aliases for the torch build's batched variants
# (random_add_gaussian_noise_pt :545-556, random_add_poisson_noise_pt
# :715-729) — identical math with an explicit JAX PRNG key prepended.
random_add_gaussian_noise_pt = random_add_gaussian_noise_jax
random_add_poisson_noise_pt = random_add_poisson_noise_jax
