"""interpolate / pixel_shuffle / grid_sample / flow_warp parity vs torch."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mrefsr_tpu.ops import (flow_warp, grid_sample, interpolate,
                            pixel_shuffle, pixel_unshuffle)

RNG = np.random.RandomState(1)


def to_torch_nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        x_nhwc.transpose(0, 3, 1, 2)))


def to_np_nhwc(t_nchw):
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize('scale,align', [(2, False), (4, False), (2, True),
                                         (0.5, False)])
def test_interpolate_bilinear(scale, align):
    x = RNG.rand(2, 8, 10, 3).astype(np.float32)
    mine = np.asarray(interpolate(jnp.asarray(x), scale_factor=scale,
                                  mode='bilinear', align_corners=align))
    theirs = to_np_nhwc(F.interpolate(to_torch_nchw(x), scale_factor=scale,
                                      mode='bilinear', align_corners=align))
    np.testing.assert_allclose(mine, theirs, atol=1e-5)


def test_interpolate_nearest():
    x = RNG.rand(1, 6, 6, 4).astype(np.float32)
    mine = np.asarray(interpolate(jnp.asarray(x), scale_factor=2,
                                  mode='nearest'))
    theirs = to_np_nhwc(F.interpolate(to_torch_nchw(x), scale_factor=2,
                                      mode='nearest'))
    np.testing.assert_allclose(mine, theirs, atol=0)


@pytest.mark.parametrize('scale', [2, 0.5])
def test_interpolate_bicubic_matches_torch(scale):
    """Regression: this path used jax.image.resize, whose cubic kernel
    is Keys A=-0.5 while torch F.interpolate uses A=-0.75 — converted
    checkpoints (e.g. BasicVSR++ with is_low_res_input=False) diverged."""
    x = RNG.rand(2, 8, 10, 3).astype(np.float32)
    mine = np.asarray(interpolate(jnp.asarray(x), scale_factor=scale,
                                  mode='bicubic', align_corners=False))
    theirs = to_np_nhwc(F.interpolate(to_torch_nchw(x), scale_factor=scale,
                                      mode='bicubic', align_corners=False))
    np.testing.assert_allclose(mine, theirs, atol=1e-5)


@pytest.mark.parametrize('scale', [2, 0.5])
def test_interpolate_bicubic_align_corners_matches_torch(scale):
    x = RNG.rand(1, 8, 10, 2).astype(np.float32)
    mine = np.asarray(interpolate(jnp.asarray(x), scale_factor=scale,
                                  mode='bicubic', align_corners=True))
    theirs = to_np_nhwc(F.interpolate(to_torch_nchw(x), scale_factor=scale,
                                      mode='bicubic', align_corners=True))
    np.testing.assert_allclose(mine, theirs, atol=1e-5)


def test_flow_warp_nearest_and_padding_validation():
    """Regression: interp_mode was accepted and ignored (nearest
    silently sampled bilinearly) and unknown padding modes silently
    clamped like 'border'."""
    x = RNG.rand(1, 6, 7, 2).astype(np.float32)
    flow = (RNG.rand(1, 6, 7, 2).astype(np.float32) - 0.5) * 3
    mine = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow),
                                interp_mode='nearest'))
    # torch reference: grid + flow normalized, grid_sample nearest
    tx = to_torch_nchw(x)
    gy, gx = torch.meshgrid(torch.arange(6), torch.arange(7),
                            indexing='ij')
    grid = torch.stack([gx, gy], dim=-1).float()[None] + \
        torch.from_numpy(flow)
    grid[..., 0] = 2.0 * grid[..., 0] / 6 - 1.0
    grid[..., 1] = 2.0 * grid[..., 1] / 5 - 1.0
    theirs = to_np_nhwc(F.grid_sample(tx, grid, mode='nearest',
                                      padding_mode='zeros',
                                      align_corners=True))
    np.testing.assert_allclose(mine, theirs, atol=0)
    with pytest.raises(NotImplementedError):
        flow_warp(jnp.asarray(x), jnp.asarray(flow),
                  padding_mode='reflection')
    with pytest.raises(NotImplementedError):
        flow_warp(jnp.asarray(x), jnp.asarray(flow), interp_mode='bicubic')


def test_interpolate_size_arg():
    x = RNG.rand(1, 7, 9, 2).astype(np.float32)
    mine = np.asarray(interpolate(jnp.asarray(x), size=(5, 6),
                                  mode='bilinear', align_corners=False))
    theirs = to_np_nhwc(F.interpolate(to_torch_nchw(x), size=(5, 6),
                                      mode='bilinear', align_corners=False))
    np.testing.assert_allclose(mine, theirs, atol=1e-5)


@pytest.mark.parametrize('r', [2, 3])
def test_pixel_shuffle(r):
    x = RNG.rand(2, 4, 5, 6 * r * r).astype(np.float32)
    mine = np.asarray(pixel_shuffle(jnp.asarray(x), r))
    theirs = to_np_nhwc(F.pixel_shuffle(to_torch_nchw(x), r))
    np.testing.assert_allclose(mine, theirs, atol=0)


def test_pixel_unshuffle_roundtrip():
    x = RNG.rand(1, 8, 8, 3).astype(np.float32)
    y = pixel_unshuffle(jnp.asarray(x), 2)
    back = pixel_shuffle(y, 2)
    np.testing.assert_allclose(np.asarray(back), x, atol=0)


@pytest.mark.parametrize('align', [True, False])
@pytest.mark.parametrize('pad_mode', ['zeros', 'border'])
def test_grid_sample(align, pad_mode):
    x = RNG.rand(2, 9, 11, 3).astype(np.float32)
    grid = (RNG.rand(2, 5, 6, 2).astype(np.float32) * 2.4 - 1.2)
    mine = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid),
                                  align_corners=align,
                                  padding_mode=pad_mode))
    theirs = to_np_nhwc(
        F.grid_sample(to_torch_nchw(x), torch.from_numpy(grid),
                      mode='bilinear', padding_mode=pad_mode,
                      align_corners=align))
    np.testing.assert_allclose(mine, theirs, atol=1e-5)


def test_flow_warp_matches_torch_composition():
    """flow_warp == torch grid_sample(grid + flow normalized), the exact
    composition at reference arch_util.py:199-231."""
    x = RNG.rand(1, 8, 8, 2).astype(np.float32)
    flow = RNG.randn(1, 8, 8, 2).astype(np.float32) * 2

    mine = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))

    tx = to_torch_nchw(x)
    h, w = 8, 8
    grid_y, grid_x = torch.meshgrid(torch.arange(h), torch.arange(w),
                                    indexing='ij')
    grid = torch.stack((grid_x, grid_y), 2).float()[None]
    vgrid = grid + torch.from_numpy(flow)
    vgrid_x = 2.0 * vgrid[..., 0] / max(w - 1, 1) - 1.0
    vgrid_y = 2.0 * vgrid[..., 1] / max(h - 1, 1) - 1.0
    vgrid_scaled = torch.stack((vgrid_x, vgrid_y), dim=3)
    theirs = to_np_nhwc(F.grid_sample(tx, vgrid_scaled, mode='bilinear',
                                      padding_mode='zeros',
                                      align_corners=True))
    np.testing.assert_allclose(mine, theirs, atol=1e-5)
