"""Parity tests for the degradation stack vs the reference
(basicsr/data/degradations.py, utils/diffjpeg.py, utils/img_process_util.py)
loaded standalone with torch on CPU."""
import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mrefsr_tpu.data import degradations as deg
from mrefsr_tpu.utils.diffjpeg import DiffJPEG, quality_to_factor
from mrefsr_tpu.utils.img_process_util import USMSharp, filter2D, usm_sharp


def _stub_torchvision():
    """The reference degradations module imports torchvision's
    rgb_to_grayscale; replicate it (0.2989/0.587/0.114 on RGB)."""
    import types
    if 'torchvision.transforms.functional_tensor' in sys.modules:
        return

    def rgb_to_grayscale(img, num_output_channels=1):
        r, g, b = img.unbind(dim=-3)
        l_img = (0.2989 * r + 0.587 * g + 0.114 * b).to(img.dtype)
        l_img = l_img.unsqueeze(dim=-3)
        if num_output_channels == 3:
            l_img = l_img.expand(img.shape)
        return l_img

    tv = sys.modules.get('torchvision') or types.ModuleType('torchvision')
    transforms = types.ModuleType('torchvision.transforms')
    ft = types.ModuleType('torchvision.transforms.functional_tensor')
    ft.rgb_to_grayscale = rgb_to_grayscale
    tv.transforms = transforms
    transforms.functional_tensor = ft
    sys.modules.setdefault('torchvision', tv)
    sys.modules['torchvision.transforms'] = transforms
    sys.modules['torchvision.transforms.functional_tensor'] = ft


def _load(name, rel):
    _stub_torchvision()
    spec = importlib.util.spec_from_file_location(
        name, f'/root/reference/{rel}')
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def ref_deg():
    return _load('_ref_degradations', 'basicsr/data/degradations.py')


@pytest.fixture(scope='module')
def ref_jpeg():
    return _load('_ref_diffjpeg', 'basicsr/utils/diffjpeg.py')


@pytest.fixture(scope='module')
def ref_ipu():
    return _load('_ref_img_process_util',
                 'basicsr/utils/img_process_util.py')


RNG = np.random.RandomState(7)


# ------------------------------------------------------------- kernels
def test_bivariate_kernels_parity(ref_deg):
    for iso in (True, False):
        k = deg.bivariate_Gaussian(21, 2.0, 3.0, 0.7, isotropic=iso)
        kr = ref_deg.bivariate_Gaussian(21, 2.0, 3.0, 0.7, isotropic=iso)
        np.testing.assert_allclose(k, kr, atol=1e-12)
        k = deg.bivariate_generalized_Gaussian(
            21, 2.0, 3.0, 0.7, 1.5, isotropic=iso)
        kr = ref_deg.bivariate_generalized_Gaussian(
            21, 2.0, 3.0, 0.7, 1.5, isotropic=iso)
        np.testing.assert_allclose(k, kr, atol=1e-12)
        k = deg.bivariate_plateau(21, 2.0, 3.0, 0.7, 2.0, isotropic=iso)
        kr = ref_deg.bivariate_plateau(21, 2.0, 3.0, 0.7, 2.0, isotropic=iso)
        np.testing.assert_allclose(k, kr, atol=1e-12)


def test_circular_lowpass_kernel_parity(ref_deg):
    for cutoff, ks, pad in ((np.pi / 3, 13, 21), (2.5, 21, 0)):
        k = deg.circular_lowpass_kernel(cutoff, ks, pad_to=pad)
        kr = ref_deg.circular_lowpass_kernel(cutoff, ks, pad_to=pad)
        np.testing.assert_allclose(k, kr, atol=1e-12)
        assert abs(k.sum() - 1) < 1e-6


def test_random_mixed_kernels_same_stream(ref_deg):
    """With the same global RNG state the samplers draw identical
    kernels — proves the sampling order matches the reference."""
    args = (['iso', 'aniso', 'generalized_iso', 'generalized_aniso',
             'plateau_iso', 'plateau_aniso'], [1 / 6] * 6, 21,
            (0.6, 5), (0.6, 5), (-np.pi, np.pi), (0.5, 8), (0.5, 8),
            (0.75, 1.25))
    for seed in range(4):
        np.random.seed(seed)
        import random as _random
        _random.seed(seed)
        k = deg.random_mixed_kernels(*args)
        np.random.seed(seed)
        _random.seed(seed)
        kr = ref_deg.random_mixed_kernels(*args)
        np.testing.assert_allclose(k, kr, atol=1e-12)


# ------------------------------------------------------------- noise
def test_numpy_noise_parity(ref_deg):
    img = RNG.rand(16, 16, 3).astype(np.float32)
    np.random.seed(5)
    out = deg.add_gaussian_noise(img, sigma=20, clip=True, rounds=True,
                                 gray_noise=True)
    np.random.seed(5)
    out_ref = ref_deg.add_gaussian_noise(img, sigma=20, clip=True,
                                         rounds=True, gray_noise=True)
    np.testing.assert_allclose(out, out_ref, atol=1e-7)

    np.random.seed(9)
    out = deg.add_poisson_noise(img, scale=0.8, gray_noise=True)
    np.random.seed(9)
    out_ref = ref_deg.add_poisson_noise(img, scale=0.8, gray_noise=True)
    np.testing.assert_allclose(out, out_ref, atol=1e-7)


def test_jax_gaussian_noise_stats():
    img = jnp.asarray(RNG.rand(4, 16, 16, 3).astype(np.float32))
    key = jax.random.PRNGKey(0)
    sigma = jnp.asarray([10., 20., 30., 40.])
    noise = deg.generate_gaussian_noise_jax(key, img, sigma, gray_noise=0)
    std = np.asarray(noise).std(axis=(1, 2, 3)) * 255
    np.testing.assert_allclose(std, [10, 20, 30, 40], rtol=0.1)
    # gray rows have identical channels
    noise_g = deg.generate_gaussian_noise_jax(
        key, img, sigma, gray_noise=jnp.asarray([1., 0., 1., 0.]))
    n = np.asarray(noise_g)
    assert np.allclose(n[0, ..., 0], n[0, ..., 1])
    assert not np.allclose(n[1, ..., 0], n[1, ..., 1])


def test_jax_poisson_vals_matches_torch(ref_deg):
    """The histogram-based unique-level count must equal the reference's
    torch.unique loop for the vals scaling."""
    img_np = (RNG.rand(2, 12, 12, 3) * 0.5).astype(np.float32)
    img_t = torch.from_numpy(img_np.transpose(0, 3, 1, 2))
    imgq = torch.clamp((img_t * 255.0).round(), 0, 255) / 255.
    vals_ref = [2**np.ceil(np.log2(len(torch.unique(imgq[i]))))
                for i in range(2)]
    from mrefsr_tpu.data.degradations import _unique_vals
    vals = np.asarray(_unique_vals(jnp.asarray(img_np))).reshape(-1)
    np.testing.assert_allclose(vals, vals_ref)


def test_jax_poisson_noise_stats():
    img = jnp.asarray(np.clip(RNG.rand(2, 16, 16, 3), 0.2, 0.8)
                      .astype(np.float32))
    out = deg.random_add_poisson_noise_jax(
        jax.random.PRNGKey(1), img, scale_range=(0.5, 1.0), gray_prob=0.5)
    out = np.asarray(out)
    assert out.shape == (2, 16, 16, 3)
    assert out.min() >= 0 and out.max() <= 1
    assert not np.allclose(out, np.asarray(img))


# ------------------------------------------------------------- filter2D/USM
def test_filter2d_parity(ref_ipu):
    img = RNG.rand(3, 10, 11, 2).astype(np.float32)
    kernel = RNG.rand(3, 5, 5).astype(np.float32)
    out = np.asarray(filter2D(jnp.asarray(img), jnp.asarray(kernel)))
    out_ref = ref_ipu.filter2D(
        torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous(),
        torch.from_numpy(kernel)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, out_ref, atol=1e-5)
    # shared kernel path
    out = np.asarray(filter2D(jnp.asarray(img), jnp.asarray(kernel[:1])))
    out_ref = ref_ipu.filter2D(
        torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous(),
        torch.from_numpy(kernel[:1])).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, out_ref, atol=1e-5)


def test_usm_sharp_parity(ref_ipu):
    img = RNG.rand(2, 24, 24, 3).astype(np.float32)
    usm = USMSharp(radius=13)
    out = np.asarray(usm(jnp.asarray(img)))
    usm_ref = ref_ipu.USMSharp(radius=13)
    out_ref = usm_ref(torch.from_numpy(
        img.transpose(0, 3, 1, 2)).contiguous()).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, out_ref, atol=1e-4)


def test_usm_sharp_numpy_matches_cv2_module(ref_ipu):
    img = RNG.rand(24, 24, 3).astype(np.float32)
    out = usm_sharp(img, radius=13)
    out_ref = ref_ipu.usm_sharp(img, radius=13)
    np.testing.assert_allclose(out, out_ref, atol=1e-6)


# ------------------------------------------------------------- DiffJPEG
def test_quality_to_factor_parity(ref_jpeg):
    for q in (10., 45., 50., 75., 95.):
        np.testing.assert_allclose(float(quality_to_factor(q)),
                                   ref_jpeg.quality_to_factor(q), rtol=1e-6)


@pytest.mark.parametrize('differentiable', [False, True])
def test_diffjpeg_parity(ref_jpeg, differentiable):
    img = RNG.rand(2, 24, 20, 3).astype(np.float32)
    quality = np.array([20., 80.], dtype=np.float32)
    jpeg = DiffJPEG(differentiable=differentiable)
    out = np.asarray(jpeg(jnp.asarray(img), jnp.asarray(quality)))
    ref = ref_jpeg.DiffJPEG(differentiable=differentiable)
    out_ref = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                  torch.from_numpy(quality.copy())
                  ).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, out_ref, atol=2e-4)


def test_diffjpeg_grad_flows():
    img = jnp.asarray(RNG.rand(1, 16, 16, 3).astype(np.float32))
    jpeg = DiffJPEG(differentiable=True)
    g = jax.grad(lambda x: jnp.sum(jpeg(x, 50.)))(img)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
