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
