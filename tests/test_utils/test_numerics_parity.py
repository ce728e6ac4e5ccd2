"""Numerics parity: imresize / color / PSNR / SSIM vs the reference
implementations (loaded standalone from /root/reference)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/repo/tests')
from ref_loader import (load_ref_color_util, load_ref_matlab_functions,
                        load_ref_psnr_ssim)

from mrefsr_tpu.metrics import (calculate_psnr, calculate_psnr_jax,
                                calculate_ssim, calculate_ssim_jax)
from mrefsr_tpu.utils import bgr2ycbcr, imresize, rgb2ycbcr, ycbcr2rgb

RNG = np.random.RandomState(0)


@pytest.mark.parametrize('scale', [0.25, 0.5, 1 / 3, 2.0, 4.0, 1.5])
def test_imresize_matches_matlab(scale):
    ref = load_ref_matlab_functions()
    img = RNG.rand(37, 41, 3).astype(np.float32)
    mine = imresize(img, scale)
    theirs = ref.imresize(img, scale)
    assert mine.shape == theirs.shape
    np.testing.assert_allclose(mine, theirs, atol=2e-5)


def test_imresize_grayscale():
    ref = load_ref_matlab_functions()
    img = RNG.rand(32, 32).astype(np.float32)
    np.testing.assert_allclose(imresize(img, 0.5), ref.imresize(img, 0.5),
                               atol=2e-5)


@pytest.mark.parametrize('fn_name', ['rgb2ycbcr', 'bgr2ycbcr', 'ycbcr2rgb',
                                     'ycbcr2bgr'])
@pytest.mark.parametrize('dtype', [np.uint8, np.float32])
def test_color_parity(fn_name, dtype):
    ref = load_ref_color_util()
    import mrefsr_tpu.utils.color_util as mine_mod
    if dtype == np.uint8:
        img = RNG.randint(0, 256, (16, 17, 3)).astype(np.uint8)
    else:
        img = RNG.rand(16, 17, 3).astype(np.float32)
    mine = getattr(mine_mod, fn_name)(img)
    theirs = getattr(ref, fn_name)(img)
    assert mine.dtype == theirs.dtype
    np.testing.assert_allclose(mine.astype(np.float64),
                               theirs.astype(np.float64), atol=1e-4)


def test_color_yonly_parity():
    ref = load_ref_color_util()
    img = RNG.rand(16, 17, 3).astype(np.float32)
    np.testing.assert_allclose(rgb2ycbcr(img, y_only=True),
                               ref.rgb2ycbcr(img, y_only=True), atol=1e-5)
    np.testing.assert_allclose(bgr2ycbcr(img, y_only=True),
                               ref.bgr2ycbcr(img, y_only=True), atol=1e-5)


@pytest.mark.parametrize('test_y', [False, True])
@pytest.mark.parametrize('crop', [0, 4])
def test_psnr_ssim_parity(test_y, crop):
    ref = load_ref_psnr_ssim()
    a = RNG.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    noise = RNG.randint(-12, 12, (64, 64, 3))
    b = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)

    psnr_mine = calculate_psnr(a, b, crop_border=crop, test_y_channel=test_y)
    psnr_ref = ref.calculate_psnr(a, b, crop_border=crop,
                                  test_y_channel=test_y)
    assert abs(psnr_mine - psnr_ref) < 1e-8

    ssim_mine = calculate_ssim(a, b, crop_border=crop, test_y_channel=test_y)
    ssim_ref = ref.calculate_ssim(a, b, crop_border=crop,
                                  test_y_channel=test_y)
    assert abs(ssim_mine - ssim_ref) < 1e-10


def test_jax_psnr_ssim_close_to_numpy():
    """Device variants agree with the MATLAB-compatible host versions."""
    # RGB [0,1] NHWC for jax; BGR uint8 HWC for numpy path
    rgb = RNG.rand(48, 48, 3).astype(np.float32)
    noise = RNG.randn(48, 48, 3).astype(np.float32) * 0.03
    rgb2 = np.clip(rgb + noise, 0, 1).astype(np.float32)

    # quantize to uint8 so both paths see identical data
    a8 = (rgb * 255).round().astype(np.uint8)
    b8 = (rgb2 * 255).round().astype(np.uint8)
    a = a8.astype(np.float32) / 255.
    b = b8.astype(np.float32) / 255.

    psnr_np = calculate_psnr(a8[..., ::-1], b8[..., ::-1], crop_border=0)
    psnr_j = float(calculate_psnr_jax(a[None], b[None], crop_border=0)[0])
    assert abs(psnr_np - psnr_j) < 0.01

    ssim_np = calculate_ssim(a8[..., ::-1], b8[..., ::-1], crop_border=0,
                             test_y_channel=True)
    ssim_j = float(calculate_ssim_jax(a[None], b[None], crop_border=0,
                                      test_y_channel=True)[0])
    assert abs(ssim_np - ssim_j) < 1e-3


def test_pt_alias_accepts_registry_images():
    """Regression: calculate_psnr_pt/ssim_pt were plain aliases of the
    NHWC-[0,1] jax variants and crashed on the HWC BGR uint8 images the
    validation loop actually dispatches."""
    from mrefsr_tpu.utils.registry import METRIC_REGISTRY
    a8 = RNG.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    b8 = np.clip(a8.astype(int) +
                 RNG.randint(-10, 10, (32, 32, 3)), 0, 255).astype(
        np.uint8)
    for alias, ref_fn, tol in (('calculate_psnr_pt', calculate_psnr,
                                0.01),
                               ('calculate_ssim_pt', calculate_ssim,
                                1e-3)):
        fn = METRIC_REGISTRY.get(alias)
        got = fn(a8, b8, crop_border=4, test_y_channel=True)
        want = ref_fn(a8, b8, crop_border=4, test_y_channel=True)
        assert isinstance(got, float)
        assert abs(got - want) < tol, (alias, got, want)


def test_ycbcr_roundtrip():
    img = RNG.rand(8, 8, 3).astype(np.float32)
    back = ycbcr2rgb(rgb2ycbcr(img))
    np.testing.assert_allclose(back, img, atol=2e-2)


@pytest.mark.parametrize('y_only', [False, True])
def test_rgb2ycbcr_pt_takes_nchw(y_only):
    """rgb2ycbcr_pt is a true drop-in for the reference's
    (color_util.py:186-208): (n, 3, h, w) in -> (n, 3|1, h, w) out,
    matching the numpy rgb2ycbcr values. A tall NCHW batch (w=3 would
    be ambiguous with NHWC) guards the layout."""
    from mrefsr_tpu.utils import rgb2ycbcr_pt
    img = RNG.rand(2, 3, 8, 5).astype(np.float32)
    out = np.asarray(rgb2ycbcr_pt(img, y_only=y_only))
    assert out.shape == (2, 1 if y_only else 3, 8, 5)
    for n in range(2):
        want = rgb2ycbcr(img[n].transpose(1, 2, 0), y_only=y_only)
        if y_only:
            want = want[..., None]
        np.testing.assert_allclose(out[n].transpose(1, 2, 0), want,
                                   atol=1e-5)
