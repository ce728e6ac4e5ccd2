"""End-to-end MRAPA / RestorationNet parity vs the reference archs.

The reference nets need mmcv's CUDA modulated deformable conv; we stub
``mmcv.ops`` with a pure-torch grid_sample implementation of the same
semantics so the reference forward runs on CPU, then compare against the
flax rebuild with converted weights.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn_t
import torch.nn.functional as F

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo/tests')
from test_arch_parity import _stub_basicsr  # noqa: E402

from mrefsr_tpu.convert import torch_to_flax  # noqa: E402

REF = '/root/reference'


def torch_modulated_deform_conv2d(x, offset, mask, weight, bias, stride,
                                  padding, dilation, groups, deform_groups):
    """Pure-torch mmcv-semantics DCNv2 (bilinear gather per tap via
    grid_sample zeros-padding + weighted accumulation). Test-only."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    n, c, h, w = x.shape
    out_c, cin_g, kh, kw = weight.shape
    k = kh * kw
    dg = deform_groups
    ho = (h + 2 * padding[0] - dilation[0] * (kh - 1) - 1) // stride[0] + 1
    wo = (w + 2 * padding[1] - dilation[1] * (kw - 1) - 1) // stride[1] + 1

    oy = torch.arange(ho) * stride[0] - padding[0]
    ox = torch.arange(wo) * stride[1] - padding[1]
    base_y = oy.view(ho, 1, 1) + (torch.arange(kh) * dilation[0]).view(
        1, 1, kh).repeat_interleave(kw, dim=2).view(1, 1, k)
    base_x = ox.view(1, wo, 1) + (torch.arange(kw) * dilation[1]).repeat(
        kh).view(1, 1, k)

    offset = offset.view(n, dg, k, 2, ho, wo)
    mask = mask.view(n, dg, k, ho, wo)
    cg = c // dg
    cols = []
    for g in range(dg):
        xs = x[:, g * cg:(g + 1) * cg]
        taps = []
        for kk in range(k):
            fy = base_y[..., kk].unsqueeze(0) + offset[:, g, kk, 0]
            fx = base_x[..., kk].unsqueeze(0) + offset[:, g, kk, 1]
            gx = 2 * fx / max(w - 1, 1) - 1
            gy = 2 * fy / max(h - 1, 1) - 1
            grid = torch.stack([gx, gy], dim=-1)
            samp = F.grid_sample(xs, grid, mode='bilinear',
                                 padding_mode='zeros', align_corners=True)
            taps.append(samp * mask[:, g, kk].unsqueeze(1))
        cols.append(torch.stack(taps, dim=2))  # (n, cg, k, ho, wo)
    col = torch.cat(cols, dim=1)  # (n, c, k, ho, wo) channel-major

    og = out_c // groups
    cpg = c // groups
    outs = []
    for gr in range(groups):
        colg = col[:, gr * cpg:(gr + 1) * cpg]  # (n, cpg, k, ho, wo)
        wg = weight[gr * og:(gr + 1) * og].reshape(og, cpg, k)
        outs.append(torch.einsum('nckhw,ock->nohw', colg, wg))
    out = torch.cat(outs, dim=1)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


class ModulatedDeformConv2dStub(nn_t.Module):
    """mmcv.ops.ModulatedDeformConv2d API-compatible torch module."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deform_groups=1,
                 bias=True):
        super().__init__()
        _p = lambda v: (v, v) if isinstance(v, int) else tuple(v)  # noqa
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _p(kernel_size)
        self.stride = _p(stride)
        self.padding = _p(padding)
        self.dilation = _p(dilation)
        self.groups = groups
        self.deform_groups = deform_groups
        self.weight = nn_t.Parameter(
            torch.randn(out_channels, in_channels // groups,
                        *self.kernel_size) * 0.05)
        self.bias = nn_t.Parameter(torch.zeros(out_channels))


def _install_mmcv_stub():
    mmcv = types.ModuleType('mmcv')
    ops = types.ModuleType('mmcv.ops')
    ops.ModulatedDeformConv2d = ModulatedDeformConv2dStub
    ops.modulated_deform_conv2d = torch_modulated_deform_conv2d
    mmcv.ops = ops
    sys.modules['mmcv'] = mmcv
    sys.modules['mmcv.ops'] = ops


@pytest.fixture(scope='module')
def ref_loader():
    loader = _stub_basicsr()
    _install_mmcv_stub()
    return loader


def _fake_logger_in(mod):
    mod.logger = types.SimpleNamespace(warning=lambda *a, **k: None)


def _make_inputs(rng, b, t, h, w, ngf=16):
    """Synthetic LR input + per-level pre_offsets and ref features.

    h, w are the LR (relu3-level) sizes; levels relu2/relu1 are x2/x4.
    """
    x = rng.rand(b, h, w, 3).astype(np.float32)
    pre, feat = {}, {}
    for level, (s, c) in {'relu3_1': (1, 256), 'relu2_1': (2, 128),
                          'relu1_1': (4, 64)}.items():
        hh, ww = h * s, w * s
        pre[level] = (rng.randn(b, t, hh, ww, 9, 2) * 2).astype(np.float32)
        feat[level] = rng.rand(b, t, hh, ww, c).astype(np.float32)
    return x, pre, feat


def _to_torch_ref_inputs(x, pre, feat):
    """Convert stacked NHWC inputs to the reference's per-ref lists of
    NCHW tensors / offset dicts."""
    t = pre['relu3_1'].shape[1]
    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    pre_list, feat_list = [], []
    for i in range(t):
        # reference layout: (b, 9, h, w, 2) — ours is (b, h, w, 9, 2)
        pre_i = {lv: torch.from_numpy(
            np.ascontiguousarray(pre[lv][:, i].transpose(0, 3, 1, 2, 4)))
            for lv in pre}
        feat_i = {lv: torch.from_numpy(
            np.ascontiguousarray(feat[lv][:, i].transpose(0, 3, 1, 2)))
            for lv in feat}
        pre_list.append(pre_i)
        feat_list.append(feat_i)
    return x_t, pre_list, feat_list


def test_mrapa_restoration_parity(ref_loader):
    ref_mod = ref_loader('basicsr.archs.ref_mrapa_restoration_arch',
                         'basicsr/archs/ref_mrapa_restoration_arch.py')
    _fake_logger_in(ref_mod)
    from mrefsr_tpu.archs.ref_mrapa_restoration_arch import \
        MRAPARestorationNet

    torch.manual_seed(0)
    tm = ref_mod.MRAPARestorationNet(ngf=16, n_blocks=2, groups=2)
    tm.eval()
    fm = MRAPARestorationNet(ngf=16, n_blocks=2, groups=2)

    rng = np.random.RandomState(0)
    x, pre, feat = _make_inputs(rng, b=1, t=3, h=8, w=8, ngf=16)
    x_t, pre_list, feat_list = _to_torch_ref_inputs(x, pre, feat)

    with torch.no_grad():
        out_t = tm(x_t, pre_list, feat_list).numpy().transpose(0, 2, 3, 1)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree_util.tree_map(jnp.asarray, torch_to_flax(sd))
    out_j = np.asarray(fm.apply(
        variables, jnp.asarray(x),
        {k: jnp.asarray(v) for k, v in pre.items()},
        {k: jnp.asarray(v) for k, v in feat.items()}))

    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=2e-4)


def test_single_ref_restoration_parity(ref_loader):
    ref_mod = ref_loader('basicsr.archs.ref_restoration_arch',
                         'basicsr/archs/ref_restoration_arch.py')
    _fake_logger_in(ref_mod)
    from mrefsr_tpu.archs.ref_restoration_arch import RestorationNet

    torch.manual_seed(1)
    tm = ref_mod.RestorationNet(ngf=16, n_blocks=2, groups=2)
    tm.eval()
    fm = RestorationNet(ngf=16, n_blocks=2, groups=2)

    rng = np.random.RandomState(1)
    x, pre, feat = _make_inputs(rng, b=2, t=1, h=8, w=8, ngf=16)
    x_t, pre_list, feat_list = _to_torch_ref_inputs(x, pre, feat)

    with torch.no_grad():
        out_t = tm(x_t, pre_list[0],
                   feat_list[0]).numpy().transpose(0, 2, 3, 1)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree_util.tree_map(jnp.asarray, torch_to_flax(sd))
    pre_s = {k: jnp.asarray(v[:, 0]) for k, v in pre.items()}
    feat_s = {k: jnp.asarray(v[:, 0]) for k, v in feat.items()}
    out_j = np.asarray(fm.apply(variables, jnp.asarray(x), pre_s, feat_s))

    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=2e-4)


def test_mrapa_from_scratch_init_matches_srntt():
    """Regression: the reference's srntt_init_weights(self,'normal',0.02)
    runs over the WHOLE net (ref_mrapa_restoration_arch.py:111), so the
    residual-block convs must start at N(0, 0.02) — they were left at
    the block default kaiming*0.1 (std ~0.006 at 64ch)."""
    import jax

    from mrefsr_tpu.archs.ref_mrapa_restoration_arch import \
        MRAPARestorationNet

    rng = np.random.RandomState(0)
    net = MRAPARestorationNet(ngf=64, n_blocks=2, groups=2)
    lq = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    pre = {k: jnp.asarray(rng.rand(1, 1, s, s, 9, 2).astype(np.float32))
           for k, s in (('relu3_1', 8), ('relu2_1', 16), ('relu1_1', 32))}
    feat = {k: jnp.asarray(rng.rand(1, 1, s, s, c).astype(np.float32))
            for k, s, c in (('relu3_1', 8, 256), ('relu2_1', 16, 128),
                            ('relu1_1', 32, 64))}
    variables = net.init(jax.random.PRNGKey(0), lq, pre, feat)
    p = variables['params']
    for path in (('content_extractor', 'body.0', 'conv1'),
                 ('dyn_agg_restore', 'body_small.0', 'conv1'),
                 ('dyn_agg_restore', 'body_large.1', 'conv2')):
        node = p
        for k in path:
            node = node[k]
        std = float(np.asarray(node['kernel']).std())
        assert 0.015 < std < 0.025, (path, std)
