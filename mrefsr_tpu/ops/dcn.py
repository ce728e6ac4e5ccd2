"""Modulated deformable convolution (DCNv2) for TPU.

TPU-native rebuild of the deformable conv the reference gets from CUDA
kernels (basicsr/ops/dcn/src/deform_conv_cuda_kernel.cu:571 —
modulated_deformable_im2col — and the external mmcv.ops
ModulatedDeformConv2d used by DynAgg at
basicsr/archs/ref_mrapa_restoration_arch.py:5,74).

Formulation: per output pixel and kernel tap, bilinearly gather the input
at (base_tap_position + learned_offset), modulate by a sigmoid mask, then
contract all (tap, channel) pairs against the conv weight on the MXU —
deformable im2col as gather + one big einsum. Autodiff through the gather
gives the scatter-add backward the CUDA col2im kernels implement by hand.

Layouts (all NHWC / HWIO):
    x:      (N, H, W, C)
    offset: (N, Ho, Wo, dg, K, 2)   last dim = (dy, dx), K = kh*kw row-major
    mask:   (N, Ho, Wo, dg, K)      already sigmoid-ed by the caller
    weight: (kh, kw, C // groups, Cout)
    bias:   (Cout,) or None
"""
from functools import partial

import jax
import jax.numpy as jnp


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def modulated_deform_conv2d(x, offset, mask, weight, bias=None, stride=1,
                            padding=1, dilation=1, groups=1,
                            deform_groups=1):
    """DCNv2 forward (differentiable w.r.t. x, offset, mask, weight, bias).

    Semantics match mmcv modulated_deform_conv2d: sampling positions are
    ``p_out * stride - pad + tap * dilation + offset``; out-of-bounds
    bilinear corners contribute zero.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    n, h, w, c = x.shape
    kh, kw, cin_g, cout = weight.shape
    k = kh * kw
    ho = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    wo = (w + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    dg = deform_groups
    assert offset.shape == (n, ho, wo, dg, k, 2), (
        f'offset shape {offset.shape} != {(n, ho, wo, dg, k, 2)}')
    assert mask.shape == (n, ho, wo, dg, k)
    assert c % dg == 0 and c % groups == 0 and cin_g == c // groups

    # base sampling grid: (Ho, Wo, K)
    oy = jnp.arange(ho) * sh - ph
    ox = jnp.arange(wo) * sw - pw
    ky, kx = jnp.meshgrid(jnp.arange(kh) * dh, jnp.arange(kw) * dw,
                          indexing='ij')
    base_y = oy[:, None, None] + ky.reshape(-1)[None, None, :]  # (Ho,Wo,K)
    base_x = ox[None, :, None] + kx.reshape(-1)[None, None, :]

    fy = base_y[None, :, :, None, :] + offset[..., 0]  # (N,Ho,Wo,dg,K)
    fx = base_x[None, :, :, None, :] + offset[..., 1]

    sampled = _deform_gather(x, fy, fx, dg)  # (N,Ho,Wo,dg,K,C//dg)
    sampled = sampled * mask[..., None]
    # back to channel order: (dg, C//dg) -> C
    sampled = sampled.transpose(0, 1, 2, 4, 3, 5).reshape(n, ho, wo, k, c)

    if groups == 1:
        out = jnp.einsum('nhwkc,kco->nhwo',
                         sampled, weight.reshape(k, c, cout),
                         preferred_element_type=jnp.float32,
                         optimize=True).astype(x.dtype)
    else:
        cg = c // groups
        og = cout // groups
        s = sampled.reshape(n, ho, wo, k, groups, cg)
        wg = weight.reshape(kh * kw, cg, groups, og)
        out = jnp.einsum('nhwkgc,kcgo->nhwgo', s, wg,
                         preferred_element_type=jnp.float32,
                         optimize=True).reshape(n, ho, wo, cout)
        out = out.astype(x.dtype)

    if bias is not None:
        out = out + bias
    return out


def _deform_gather(x, fy, fx, dg):
    """Bilinear gather of per-deform-group channels at float coords.

    x: (N,H,W,C); fy/fx: (N,Ho,Wo,dg,K).
    Returns (N,Ho,Wo,dg,K,C//dg). Zero outside [-1, dim] boundary like the
    CUDA kernel (corners outside contribute 0).
    """
    n, h, w, c = x.shape
    cg = c // dg
    xg = x.reshape(n, h, w, dg, cg)

    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy1 = (fy - y0).astype(x.dtype)
    wx1 = (fx - x0).astype(x.dtype)
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    bidx = jnp.arange(n).reshape(n, 1, 1, 1, 1)
    gidx = jnp.arange(dg).reshape(1, 1, 1, dg, 1)

    def corner(yi, xi):
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = xg[bidx, yc, xc, gidx]  # (N,Ho,Wo,dg,K,cg)
        valid = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
        return vals * valid[..., None].astype(x.dtype)

    return (corner(y0, x0) * (wy0 * wx0)[..., None] +
            corner(y0, x0 + 1) * (wy0 * wx1)[..., None] +
            corner(y0 + 1, x0) * (wy1 * wx0)[..., None] +
            corner(y0 + 1, x0 + 1) * (wy1 * wx1)[..., None])


def offset_mask_from_conv_out(out, deform_groups, kernel_size=(3, 3)):
    """Split a conv_offset_mask output into (offset, mask) in this module's
    layout.

    The reference's DynAgg/DCNv2Pack conv produces 3*dg*K channels,
    chunked into (o1, o2, mask) thirds; mmcv then reads the concatenated
    (o1, o2) as interleaved (dy, dx) pairs per tap
    (ref_mrapa_restoration_arch.py:56-68). Given NHWC conv output
    (N, Ho, Wo, 3*dg*K) this returns offset (N,Ho,Wo,dg,K,2) with
    (dy, dx) ordering and raw (un-sigmoided) mask (N,Ho,Wo,dg,K).
    """
    n, ho, wo, c3 = out.shape
    k = kernel_size[0] * kernel_size[1]
    dg = deform_groups
    assert c3 == 3 * dg * k
    o1, o2, mask = jnp.split(out, 3, axis=-1)
    oo = jnp.concatenate([o1, o2], axis=-1)  # (N,Ho,Wo,2*dg*K)
    # channel layout of (o1|o2) as consumed by mmcv: [dy0,dx0,dy1,dx1,...]
    # per deform group
    oo = oo.reshape(n, ho, wo, dg, k, 2)
    mask = mask.reshape(n, ho, wo, dg, k)
    return oo, mask


class DeformConvError(ValueError):
    pass
