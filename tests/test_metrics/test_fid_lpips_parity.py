"""Random-weight torch<->flax forward parity for the FID InceptionV3
port (archs/inception.py vs reference basicsr/archs/inception.py) and
the native LPIPS tower (metrics/lpips.py vs the official
richzhang/PerceptualSimilarity LPIPS(net='vgg') formula).

torchvision is not installed in this container (the reference's
inception.py subclasses torchvision blocks), so the torch side is built
here from the published InceptionV3 architecture with the FID patches
applied (reference inception.py:189-305 documents each patched forward:
count_include_pad=False average pools in A/C/E_1, max pool in E_2),
using the pt_inception state-dict key layout. Random weights + random
BN running stats catch layout / conversion / op-semantics bugs without
any pretrained download.
"""
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn_t
import torch.nn.functional as F

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo/tests/test_archs')
from test_vgg_contras import build_torch_vgg  # noqa: E402

from mrefsr_tpu.convert import torch_to_flax  # noqa: E402

RNG = np.random.RandomState(7)


class TBasicConv2d(nn_t.Module):
    """conv(bias=False) + BN(eps=1e-3) + relu — torchvision BasicConv2d."""

    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = nn_t.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = nn_t.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TInceptionA(nn_t.Module):
    """FID-patched InceptionA (reference inception.py:189-211)."""

    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(in_ch, pool_features,
                                        kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(
            self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1,
                                           count_include_pad=False))
        return torch.cat([b1, b5, bd, bp], 1)


class TInceptionB(nn_t.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = TBasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(
            self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


class TInceptionC(nn_t.Module):
    """FID-patched InceptionC (reference inception.py:214-239)."""

    def __init__(self, in_ch, channels_7x7):
        super().__init__()
        c7 = channels_7x7
        self.branch1x1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1,
                                           count_include_pad=False))
        return torch.cat([b1, b7, bd, bp], 1)


class TInceptionD(nn_t.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3,
                                          stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


class TInceptionE(nn_t.Module):
    """InceptionE; FID E_1 uses count_include_pad=False avg pool
    (reference inception.py:242-272), E_2 a 3x3 stride-1 max pool
    (reference inception.py:275-305)."""

    def __init__(self, in_ch, use_max_pool=False):
        super().__init__()
        self.use_max_pool = use_max_pool
        self.branch1x1 = TBasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                         padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                         padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3,
                                           padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd),
                        self.branch3x3dbl_3b(bd)], 1)
        if self.use_max_pool:
            bp = F.max_pool2d(x, 3, 1, 1)
        else:
            bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
        return torch.cat([b1, b3, bd, self.branch_pool(bp)], 1)


class TFIDInceptionV3(nn_t.Module):
    """The fid_inception_v3 trunk (reference inception.py:155-186) in
    pt_inception state-dict layout, through the final average pool."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, use_max_pool=False)
        self.Mixed_7c = TInceptionE(2048, use_max_pool=True)

    def forward(self, x):
        """Block boundaries as reference inception.py:88-120; input is
        already resized/normalized. Returns the 4 block outputs."""
        outs = []
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        outs.append(x)
        x = F.max_pool2d(self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x)), 3, 2)
        outs.append(x)
        x = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(x)))
        x = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(
            self.Mixed_6a(x)))))
        outs.append(x)
        x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
        outs.append(F.adaptive_avg_pool2d(x, (1, 1)))
        return outs


def _randomize_bn_stats(model, seed):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn_t.BatchNorm2d):
            m.running_mean = torch.randn(m.running_mean.shape,
                                         generator=g) * 0.1
            m.running_var = torch.rand(m.running_var.shape,
                                       generator=g) + 0.5


@pytest.fixture(scope='module')
def inception_pair():
    from mrefsr_tpu.archs.inception import InceptionV3
    torch.manual_seed(11)
    tm = TFIDInceptionV3()
    _randomize_bn_stats(tm, 12)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree_util.tree_map(jnp.asarray, torch_to_flax(sd))
    return tm, variables, InceptionV3


def test_fid_inception_forward_parity(inception_pair):
    tm, variables, InceptionV3 = inception_pair
    fm = InceptionV3(output_blocks=(0, 1, 2, 3), resize_input=False,
                     normalize_input=True)
    x = RNG.rand(2, 83, 83, 3).astype(np.float32)
    with torch.no_grad():
        outs_t = tm(2 * torch.from_numpy(x.transpose(0, 3, 1, 2)) - 1)
    outs_j = fm.apply(variables, jnp.asarray(x))
    assert len(outs_j) == len(outs_t) == 4
    for i, (oj, ot) in enumerate(zip(outs_j, outs_t)):
        ot = ot.numpy().transpose(0, 2, 3, 1)
        assert oj.shape == ot.shape, f'block {i}'
        np.testing.assert_allclose(np.asarray(oj), ot, atol=5e-4,
                                   err_msg=f'block {i}')


def test_fid_inception_resize_parity(inception_pair):
    """resize_input=True: bilinear to 299x299 matching
    F.interpolate(align_corners=False) (reference inception.py:138-139)."""
    tm, variables, InceptionV3 = inception_pair
    fm = InceptionV3(output_blocks=(0,), resize_input=True,
                     normalize_input=True)
    x = RNG.rand(1, 75, 75, 3).astype(np.float32)
    with torch.no_grad():
        xt = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           size=(299, 299), mode='bilinear',
                           align_corners=False)
        out_t = tm(2 * xt - 1)[0]
    out_j = fm.apply(variables, jnp.asarray(x))[0]
    out_t = out_t.numpy().transpose(0, 2, 3, 1)
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=5e-4)


# --- LPIPS ---

# official ScalingLayer constants == ImageNet mean/std on [-1,1] inputs
_SHIFT = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)


def _torch_lpips_vgg(tower, tap_names, lins, x, y):
    """Official LPIPS(net='vgg') forward, reimplemented from the
    published formula (see metrics/lpips.py module docstring)."""
    from mrefsr_tpu.archs.vgg_arch import NAMES
    names = NAMES['vgg16']

    def feats(img):
        h = (img - _SHIFT) / _SCALE
        out = []
        for name, layer in zip(names, tower):
            h = layer(h)
            if name in tap_names:
                norm = torch.sqrt((h ** 2).sum(1, keepdim=True))
                out.append(h / (norm + 1e-10))
        return out

    fx, fy = feats(x), feats(y)
    total = 0.
    for fxi, fyi, w in zip(fx, fy, lins):
        diff = (fxi - fyi) ** 2
        total = total + F.conv2d(diff, w).mean(dim=(2, 3))
    return total.reshape(-1)


def test_lpips_forward_parity(tmp_path):
    from mrefsr_tpu.metrics.lpips import (LPIPS_VGG_CHNS,
                                          LPIPS_VGG_LAYERS, LPIPSVgg,
                                          load_lpips_variables)

    torch.manual_seed(21)
    tower = build_torch_vgg('vgg16', 'relu5_3')
    tower.eval()
    lins = [torch.rand(1, c, 1, 1) for c in LPIPS_VGG_CHNS]

    # emulate the torchvision vgg16 state dict (features.<idx>.*) and
    # the official lpips vgg.pth lin-head layout (lin<k>.model.1.weight)
    sd = {f'features.{i}.{leaf}': p.detach()
          for i, m in enumerate(tower) if isinstance(m, nn_t.Conv2d)
          for leaf, p in [('weight', m.weight), ('bias', m.bias)]}
    torch.save(sd, tmp_path / 'vgg16_rand.pth')
    lin_sd = {f'lin{i}.model.1.weight': w for i, w in enumerate(lins)}
    torch.save(lin_sd, tmp_path / 'lpips_vgg_rand.pth')

    variables = load_lpips_variables(str(tmp_path / 'lpips_vgg_rand.pth'),
                                     str(tmp_path / 'vgg16_rand.pth'))

    x = (RNG.rand(2, 40, 40, 3) * 2 - 1).astype(np.float32)
    y = (RNG.rand(2, 40, 40, 3) * 2 - 1).astype(np.float32)
    with torch.no_grad():
        d_t = _torch_lpips_vgg(tower, LPIPS_VGG_LAYERS, lins,
                               torch.from_numpy(x.transpose(0, 3, 1, 2)),
                               torch.from_numpy(y.transpose(0, 3, 1, 2)))
    d_j = LPIPSVgg().apply(variables, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(d_j), d_t.numpy(), atol=1e-5)
