"""DCNv2 correctness: vs plain conv (zero offsets) and a naive numpy
implementation of the mmcv modulated deformable conv semantics."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mrefsr_tpu.ops import modulated_deform_conv2d, offset_mask_from_conv_out

RNG = np.random.RandomState(2)


def naive_mdcn(x, offset, mask, weight, bias, stride, padding, dilation,
               groups, dg):
    """Straight loop implementation of mmcv's modulated deform conv.

    x (N,H,W,C); offset (N,Ho,Wo,dg,K,2) (dy,dx); mask (N,Ho,Wo,dg,K);
    weight (kh,kw,C//groups,Cout).
    """
    n, h, w, c = x.shape
    kh, kw, cg_in, cout = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    out = np.zeros((n, ho, wo, cout), np.float64)
    cpd = c // dg  # channels per deform group
    cpg = c // groups  # channels per weight group
    opg = cout // groups

    def bil(img2d, fy, fx):
        if fy <= -1 or fy >= h or fx <= -1 or fx >= w:
            return 0.0
        y0, x0 = int(np.floor(fy)), int(np.floor(fx))
        val = 0.0
        for (yy, wy) in ((y0, 1 - (fy - y0)), (y0 + 1, fy - y0)):
            for (xx, wx) in ((x0, 1 - (fx - x0)), (x0 + 1, fx - x0)):
                if 0 <= yy < h and 0 <= xx < w:
                    val += wy * wx * img2d[yy, xx]
        return val

    for b in range(n):
        for oy in range(ho):
            for ox in range(wo):
                for ci in range(c):
                    g = ci // cpd
                    wg = ci // cpg
                    for i in range(kh):
                        for j in range(kw):
                            k = i * kw + j
                            fy = (oy * stride - padding + i * dilation +
                                  offset[b, oy, ox, g, k, 0])
                            fx = (ox * stride - padding + j * dilation +
                                  offset[b, oy, ox, g, k, 1])
                            v = bil(x[b, :, :, ci], fy, fx)
                            v *= mask[b, oy, ox, g, k]
                            for oc in range(opg):
                                out[b, oy, ox, wg * opg + oc] += (
                                    v * weight[i, j, ci % cpg,
                                               wg * opg + oc])
    if bias is not None:
        out += bias
    return out


def test_zero_offset_equals_conv():
    """offset=0, mask=1 reduces DCN to an ordinary convolution."""
    x = RNG.rand(2, 8, 9, 4).astype(np.float32)
    w = RNG.randn(3, 3, 4, 6).astype(np.float32) * 0.2
    b = RNG.randn(6).astype(np.float32)
    offset = np.zeros((2, 8, 9, 2, 9, 2), np.float32)
    mask = np.ones((2, 8, 9, 2, 9), np.float32)

    mine = np.asarray(modulated_deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(w), jnp.asarray(b), stride=1, padding=1,
        deform_groups=2))

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tw = torch.from_numpy(w.transpose(3, 2, 0, 1))
    ref = F.conv2d(tx, tw, torch.from_numpy(b), stride=1, padding=1)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(mine, ref, atol=1e-4)


@pytest.mark.parametrize('dg,groups,stride', [(1, 1, 1), (2, 1, 1),
                                              (2, 2, 1), (1, 1, 2)])
def test_vs_naive(dg, groups, stride):
    n, h, w, c, cout = 1, 6, 7, 4, 4
    x = RNG.rand(n, h, w, c).astype(np.float32)
    ho = (h + 2 - 2 - 1) // stride + 1
    wo = (w + 2 - 2 - 1) // stride + 1
    offset = (RNG.randn(n, ho, wo, dg, 9, 2) * 1.5).astype(np.float32)
    mask = RNG.rand(n, ho, wo, dg, 9).astype(np.float32)
    weight = (RNG.randn(3, 3, c // groups, cout) * 0.3).astype(np.float32)
    bias = RNG.randn(cout).astype(np.float32)

    mine = np.asarray(modulated_deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), stride=stride, padding=1,
        groups=groups, deform_groups=dg))
    ref = naive_mdcn(x, offset, mask, weight, bias, stride, 1, 1, groups, dg)
    np.testing.assert_allclose(mine, ref, atol=1e-4)


@pytest.mark.parametrize('dg,groups', [(1, 1), (2, 2)])
def test_deform_conv_v1_vs_naive(dg, groups):
    """DCNv1 (maskless) == naive oracle with mask forced to 1
    (reference ops surface deform_conv.py:191,248)."""
    from mrefsr_tpu.ops import deform_conv2d
    n, h, w, c, cout = 1, 6, 7, 4, 4
    x = RNG.rand(n, h, w, c).astype(np.float32)
    offset = (RNG.randn(n, h, w, dg, 9, 2) * 1.5).astype(np.float32)
    weight = (RNG.randn(3, 3, c // groups, cout) * 0.3).astype(np.float32)

    mine = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
        stride=1, padding=1, groups=groups, deform_groups=dg))
    ones = np.ones((n, h, w, dg, 9), np.float32)
    ref = naive_mdcn(x, offset, ones, weight, None, 1, 1, 1, groups, dg)
    np.testing.assert_allclose(mine, ref, atol=1e-4)


def test_far_out_of_range_offsets_are_zero():
    """Samples whose whole 2x2 bilinear patch is outside [-1, dim] must
    contribute exactly zero (the packed-corner gather clips the row index
    but masks validity on the unclipped coords — this pins that contract)."""
    n, h, w, c = 1, 6, 7, 4
    x = RNG.rand(n, h, w, c).astype(np.float32) + 1.0  # strictly positive
    offset = np.full((n, h, w, 1, 9, 2), 25.0, np.float32)  # way outside
    offset[0, 2:4] = -25.0  # and the other side
    mask = np.ones((n, h, w, 1, 9), np.float32)
    weight = np.ones((3, 3, c, c), np.float32)

    out = np.asarray(modulated_deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), None, stride=1, padding=1, deform_groups=1))
    np.testing.assert_array_equal(out, np.zeros_like(out))

    # and the naive reference agrees
    ref = naive_mdcn(x, offset, mask, weight, None, 1, 1, 1, 1, 1)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_grads_flow():
    """Autodiff produces finite grads for x, offset, mask, weight."""
    x = jnp.asarray(RNG.rand(1, 5, 5, 2).astype(np.float32))
    offset = jnp.asarray(RNG.randn(1, 5, 5, 1, 9, 2).astype(np.float32))
    mask = jnp.asarray(RNG.rand(1, 5, 5, 1, 9).astype(np.float32))
    w = jnp.asarray((RNG.randn(3, 3, 2, 2) * 0.3).astype(np.float32))

    def loss(x, offset, mask, w):
        return jnp.sum(modulated_deform_conv2d(x, offset, mask, w) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, offset, mask, w)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0


def test_offset_mask_from_conv_out_layout():
    """Channel unpacking matches the mmcv (o1|o2) interleave contract:
    offset channel (g*K+k)*2 is dy of tap k, +1 is dx; DynAgg adds
    pre_offset y to even channels (ref_mrapa_restoration_arch.py:61-66)."""
    n, ho, wo, dg, k = 1, 2, 2, 2, 9
    conv_out = np.zeros((n, ho, wo, 3 * dg * k), np.float32)
    # mark channel j of the would-be cat(o1,o2) with value j
    for j in range(2 * dg * k):
        if j < dg * k:
            conv_out[..., j] = j  # o1 part
        else:
            conv_out[..., dg * k + (j - dg * k)] = j  # o2 part occupies
            # channels [dg*k, 2*dg*k) of conv_out
    offset, mask = offset_mask_from_conv_out(jnp.asarray(conv_out), dg)
    offset = np.asarray(offset)
    for g in range(dg):
        for kk in range(k):
            j_y = (g * k + kk) * 2
            j_x = j_y + 1
            assert offset[0, 0, 0, g, kk, 0] == j_y
            assert offset[0, 0, 0, g, kk, 1] == j_x
