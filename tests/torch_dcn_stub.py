"""Pure-torch modulated deformable conv with mmcv/basicsr semantics —
lets reference archs run on CPU for parity tests (no CUDA ops)."""
import torch
import torch.nn as nn
import torch.nn.functional as F


def torch_modulated_deform_conv2d(x, offset, mask, weight, bias, stride,
                                  padding, dilation, groups,
                                  deform_groups):
    """Bilinear gather per tap via grid_sample (zeros padding) + weighted
    accumulation. Matches the mmcv CUDA kernel's channel layout:
    offset channel (g*K+k)*2 = dy, +1 = dx; mask channel g*K+k."""
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
        cols.append(torch.stack(taps, dim=2))
    col = torch.cat(cols, dim=1)  # (n, c, k, ho, wo)

    og = out_c // groups
    cpg = c // groups
    outs = []
    for gr in range(groups):
        colg = col[:, gr * cpg:(gr + 1) * cpg]
        wg = weight[gr * og:(gr + 1) * og].reshape(og, cpg, k)
        outs.append(torch.einsum('nckhw,ock->nohw', colg, wg))
    out = torch.cat(outs, dim=1)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


class ModulatedDeformConv2dStub(nn.Module):
    """mmcv.ops.ModulatedDeformConv2d API-compatible module."""

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
        self.weight = nn.Parameter(
            torch.randn(out_channels, in_channels // groups,
                        *self.kernel_size) * 0.05)
        self.bias = nn.Parameter(torch.zeros(out_channels))


class ModulatedDeformConvPackStub(ModulatedDeformConv2dStub):
    """basicsr ops ModulatedDeformConvPack: adds the conv_offset child
    (used by arch_util.DCNv2Pack). Accepts the 'deformable_groups' kw the
    basicsr version uses."""

    def __init__(self, *args, **kwargs):
        if 'deformable_groups' in kwargs:
            kwargs['deform_groups'] = kwargs.pop('deformable_groups')
        super().__init__(*args, **kwargs)
        self.deformable_groups = self.deform_groups
        self.conv_offset = nn.Conv2d(
            self.in_channels,
            self.deform_groups * 3 * self.kernel_size[0] *
            self.kernel_size[1],
            kernel_size=self.kernel_size, stride=self.stride,
            padding=self.padding, bias=True)
        self.conv_offset.weight.data.zero_()
        self.conv_offset.bias.data.zero_()
