"""DFDNet structural test: init + forward shapes + dictionary swap
mechanics with a synthetic facial-component dictionary. (Full-forward
parity vs the reference needs torchvision's pretrained VGGFace weights,
which this environment cannot download; the VGG extractor itself has
its own parity tests.)"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrefsr_tpu.archs.dfdnet_arch import DFDNet

SIZE = 512


@pytest.mark.slow
def test_dfdnet_forward_shapes():
    rng = np.random.RandomState(0)
    face_dict = {}
    channel_sizes = {256: 128, 128: 256, 64: 512, 32: 512}
    part_sizes = {'left_eye': 10, 'right_eye': 10, 'nose': 8, 'mouth': 12}
    for f_size, c in channel_sizes.items():
        face_dict[f'{f_size}'] = {
            part: jnp.asarray(rng.rand(
                3, max(2, part_sizes[part] * f_size // 256),
                max(2, part_sizes[part] * f_size // 256),
                c).astype(np.float32))
            for part in part_sizes
        }

    # xyxy part boxes in 512-space
    part_locations = [
        np.array([[100, 100, 180, 180]]),   # left_eye
        np.array([[300, 100, 380, 180]]),   # right_eye
        np.array([[220, 200, 300, 280]]),   # nose
        np.array([[180, 330, 340, 420]]),   # mouth
    ]

    model = DFDNet(num_feat=64)  # tied to VGG channel widths
    x = jnp.asarray(rng.rand(1, SIZE, SIZE, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, part_locations,
                           face_dict)
    # ModuleDict-compatible attention scopes
    assert 'left_eye_256.0' in variables['params']['attn_blocks']
    assert 'mouth_32.2' in variables['params']['attn_blocks']

    out = model.apply(variables, x, part_locations, face_dict)
    assert out.shape == (1, SIZE, SIZE, 3)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert out.min() >= -1 and out.max() <= 1


def test_crop_resize_bilinear_matches_slice_then_interpolate():
    from mrefsr_tpu.archs.dfdnet_arch import crop_resize_bilinear
    from mrefsr_tpu.ops import interpolate
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 64, 64, 5).astype(np.float32))
    for (y0, x0, y1, x1), out in [((10, 20, 42, 36), (12, 12)),
                                  ((0, 0, 7, 9), (16, 16)),   # upsample
                                  ((5, 5, 61, 60), (8, 8))]:  # downsample
        want = interpolate(x[:, y0:y1, x0:x1, :], size=out,
                           mode='bilinear', align_corners=False)
        got = crop_resize_bilinear(
            x, tuple(jnp.int32(v) for v in (y0, x0, y1, x1)), out)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_paste_nearest_matches_interpolate_nearest():
    from mrefsr_tpu.archs.dfdnet_arch import paste_nearest
    from mrefsr_tpu.ops import interpolate
    rng = np.random.RandomState(4)
    atom = jnp.asarray(rng.rand(10, 12, 3).astype(np.float32))
    for y0, x0, y1, x1 in [(10, 20, 42, 36), (0, 0, 7, 9), (30, 3, 64, 60)]:
        full, mask = paste_nearest(
            atom, tuple(jnp.int32(v) for v in (y0, x0, y1, x1)), (64, 64))
        want = interpolate(atom[None], size=(y1 - y0, x1 - x0),
                           mode='nearest')
        np.testing.assert_allclose(
            np.asarray(full)[0, y0:y1, x0:x1], np.asarray(want)[0],
            atol=0)
        m = np.zeros((64, 64), bool)
        m[y0:y1, x0:x1] = True
        np.testing.assert_array_equal(np.asarray(mask)[0, :, :, 0], m)


def test_masked_fullmap_attn_equals_crop_attn():
    """Masked full-map convs == crop-local convs with zero padding at
    the box edge (the trick that makes the dictionary swap jittable)."""
    from mrefsr_tpu.archs.dfdnet_arch import _AttnBlocks
    rng = np.random.RandomState(5)
    y0, x0, y1, x1 = 7, 3, 29, 24
    full = np.zeros((1, 40, 40, 6), np.float32)
    full[:, y0:y1, x0:x1] = rng.rand(1, y1 - y0, x1 - x0, 6)
    mask = np.zeros((1, 40, 40, 1), np.float32)
    mask[:, y0:y1, x0:x1] = 1

    blocks = _AttnBlocks()
    variables = blocks.init(jax.random.PRNGKey(0),
                            jnp.asarray(full), 'nose', 40, 6)
    crop_out = blocks.apply(variables, jnp.asarray(full[:, y0:y1, x0:x1]),
                            'nose', 40, 6)
    full_out = blocks.apply(variables, jnp.asarray(full), 'nose', 40, 6,
                            jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(full_out)[:, y0:y1, x0:x1],
                               np.asarray(crop_out), atol=1e-5)


@pytest.mark.slow
def test_dfdnet_forward_jits():
    """The whole DFDNet forward compiles under jit (static shapes) and
    matches the eager apply."""
    rng = np.random.RandomState(1)
    face_dict = {}
    channel_sizes = {256: 128, 128: 256, 64: 512, 32: 512}
    part_sizes = {'left_eye': 10, 'right_eye': 10, 'nose': 8, 'mouth': 12}
    for f_size, c in channel_sizes.items():
        face_dict[f'{f_size}'] = {
            part: jnp.asarray(rng.rand(
                3, max(2, part_sizes[part] * f_size // 256),
                max(2, part_sizes[part] * f_size // 256),
                c).astype(np.float32))
            for part in part_sizes
        }
    part_locations = [
        jnp.asarray([[100, 100, 180, 180]]),
        jnp.asarray([[300, 100, 380, 180]]),
        jnp.asarray([[220, 200, 300, 280]]),
        jnp.asarray([[180, 330, 340, 420]]),
    ]
    model = DFDNet(num_feat=64)
    x = jnp.asarray(rng.rand(1, SIZE, SIZE, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, part_locations,
                           face_dict)
    eager = model.apply(variables, x, part_locations, face_dict)
    jitted = jax.jit(model.apply)(variables, x, part_locations, face_dict)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager),
                               atol=2e-5)
