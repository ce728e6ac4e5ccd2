"""Native LPIPS parity vs a hand-rolled torch implementation of the
official richzhang/PerceptualSimilarity LPIPS(net='vgg') math, with
random weights (this environment ships neither the lpips package nor
pretrained checkpoints)."""
import numpy as np
import pytest
import torch
import torch.nn as nn_t

import jax.numpy as jnp

from mrefsr_tpu.metrics import LPIPSVgg
from mrefsr_tpu.metrics.lpips import (LPIPS_VGG_CHNS, LPIPS_VGG_LAYERS,
                                      load_lpips_variables)

RNG = np.random.RandomState(7)

SHIFT = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
SCALE = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)


def build_torch_vgg16_tower():
    """VGG16 features up to relu5_3, tap indices per torchvision
    layout."""
    cfg = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
           512, 512, 512, 'M', 512, 512, 512]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == 'M':
            layers.append(nn_t.MaxPool2d(2, 2))
        else:
            layers.append(nn_t.Conv2d(in_ch, v, 3, 1, 1))
            layers.append(nn_t.ReLU())
            in_ch = v
    return nn_t.Sequential(*layers)


TAP_IDX = {'relu1_2': 3, 'relu2_2': 8, 'relu3_3': 15, 'relu4_3': 22,
           'relu5_3': 29}


def torch_lpips(tower, lins, x, y):
    """Official LPIPS math: scaling layer, taps, unit-norm, sq diff,
    1x1 lin, spatial mean, sum."""
    def feats(t):
        t = (t - SHIFT) / SCALE
        out = {}
        for i, m in enumerate(tower):
            t = m(t)
            for name, idx in TAP_IDX.items():
                if i == idx:
                    out[name] = t
        return out

    def unit(t):
        norm = torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True))
        return t / (norm + 1e-10)

    fx, fy = feats(x), feats(y)
    total = 0.
    for i, name in enumerate(LPIPS_VGG_LAYERS):
        d = (unit(fx[name]) - unit(fy[name])) ** 2
        lin = lins[i].view(1, -1, 1, 1)
        total = total + (d * lin).sum(dim=1).mean(dim=(1, 2))
    return total


def test_lpips_parity_vs_torch(tmp_path):
    torch.manual_seed(3)
    tower = build_torch_vgg16_tower().eval()
    lins = [torch.rand(c) * 0.1 for c in LPIPS_VGG_CHNS]

    x = torch.tensor(RNG.rand(2, 3, 48, 48).astype(np.float32)) * 2 - 1
    y = torch.tensor(RNG.rand(2, 3, 48, 48).astype(np.float32)) * 2 - 1
    with torch.no_grad():
        ref = torch_lpips(tower, lins, x, y).numpy()

    # round-trip through the checkpoint converters: emulate a
    # torchvision state dict + an official lpips vgg.pth
    vgg_sd = {f'features.{i}.{leaf}': p.detach().clone()
              for i, m in enumerate(tower) if isinstance(m, nn_t.Conv2d)
              for leaf, p in [('weight', m.weight), ('bias', m.bias)]}
    lin_sd = {f'lin{i}.model.1.weight':
              lins[i].view(1, -1, 1, 1).clone()
              for i in range(len(lins))}
    torch.save(vgg_sd, tmp_path / 'vgg16.pth')
    torch.save(lin_sd, tmp_path / 'lpips_vgg.pth')

    variables = load_lpips_variables(str(tmp_path / 'lpips_vgg.pth'),
                                     str(tmp_path / 'vgg16.pth'))
    got = LPIPSVgg().apply(
        variables,
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(y.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4,
                               atol=2e-5)

    # calculate_lpips receives BGR images (tensor2img validation
    # convention) — regression: it used to feed them to the RGB tower
    # channel-swapped
    from mrefsr_tpu.metrics import calculate_lpips
    x_rgb = (x.numpy().transpose(0, 2, 3, 1)[0] + 1) / 2 * 255
    y_rgb = (y.numpy().transpose(0, 2, 3, 1)[0] + 1) / 2 * 255
    val = calculate_lpips(x_rgb[..., ::-1], y_rgb[..., ::-1],
                          crop_border=0,
                          lpips_weights=str(tmp_path / 'lpips_vgg.pth'),
                          vgg16_weights=str(tmp_path / 'vgg16.pth'))
    np.testing.assert_allclose(val, ref[0], rtol=2e-4, atol=2e-5)


def test_calculate_lpips_requires_weights():
    from mrefsr_tpu.metrics import calculate_lpips
    img = RNG.rand(16, 16, 3) * 255
    with pytest.raises(ValueError, match='lpips_weights'):
        calculate_lpips(img, img, crop_border=0)
