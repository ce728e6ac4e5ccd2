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
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _tap_checkpoint(fn):
    """Checkpoint wrapper for the per-tap scan body.

    Default: full remat — the backward re-runs the tap forward,
    including its gather (minimum live memory; the CUDA reference's
    col2im backward also re-walks the sampling grid,
    deform_conv_cuda_kernel.cu:280).

    MREFSR_DCN_SAVE_GATHER=1: save the gathered corner rows
    (checkpoint_name 'dcn_gather') across the scan so the backward
    streams them from HBM instead of re-gathering — the gather unit is
    the step bottleneck (~Mrow/s floor, docs/TPUDesign.md), so this
    trades HBM capacity for one whole gather pass per step.
    Measured (stage3 bench, v5e): SLOWER — 7.62 img/s/chip at b=6 vs
    9.97 default at b=8 (OOMs at b=8: the relu1_1 rows alone are
    4.4 GB); streaming the saved rows back through HBM costs more than
    re-gathering from the VMEM-sized slabs. Kept as a knob for future
    hardware where the balance differs.
    """
    if os.environ.get('MREFSR_DCN_SAVE_GATHER'):
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.save_only_these_names(
                'dcn_gather'))
    return jax.checkpoint(fn)


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

    # base sampling grid per tap: (K,) tap coordinates + (Ho,Wo) grid.
    # Coordinate math stays float32 even when offsets are bf16: above
    # coordinate 256 a bf16 position quantizes to ulp 2, which would
    # corrupt sampling on ~500px relu1_1 canvases. Only the gathered
    # values (and the fractional corner weights) use the table dtype.
    oy = jnp.arange(ho) * sh - ph  # (Ho,) int32
    ox = jnp.arange(wo) * sw - pw  # (Wo,) int32
    ky, kx = jnp.meshgrid(jnp.arange(kh) * dh, jnp.arange(kw) * dw,
                          indexing='ij')
    ky = ky.reshape(-1).astype(jnp.float32)  # (K,)
    kx = kx.reshape(-1).astype(jnp.float32)

    cg = c // dg
    if groups == 1:
        out = _mdcn_slab_scan(x, offset, mask, weight,
                              (n, h, w, ho, wo, k, dg, cg, cout),
                              oy, ox, ky, kx)
    else:
        out = _mdcn_tap_scan(x, offset, mask, weight,
                             (n, h, w, ho, wo, k, dg, cg, cout, groups,
                              cin_g), oy, ox, ky, kx)
    out = out.astype(x.dtype)

    if bias is not None:
        out = out + bias
    return out


def _mdcn_slab_scan(x, offset, mask, weight, dims, oy, ox, ky, kx):
    """DCNv2 forward as nested scans item -> deform-group -> tap, with the
    gather confined to one (item, group) corner-packed slab at a time.

    TPU row-gather throughput depends on the TABLE operand size: a slab
    that fits VMEM gathers ~4.6x faster than one big flat table
    (measured 318 vs 70 Mrow/s at the MRAPA relu1_1 scale — see
    scripts/benchmarks/bench_gather2.py). The per-(item, group) slab is
    (H+1)(W+1) x 4*cg, e.g. 1.66 MB at relu1_1 — comfortably VMEM-sized.
    The tap scan additionally keeps only one tap's intermediates live
    (im2col never materializes) and its checkpoint keeps the BACKWARD
    footprint at one tap too.
    """
    n, h, w, ho, wo, k, dg, cg, cout = dims
    x4 = _pack_bilinear_corners(x, dg)  # (N, dg, (H+1)(W+1), 4*cg)
    # slab-major rearrangement: (N, dg, K, Ho, Wo, ...)
    off_t = jnp.moveaxis(offset, 3, 1)       # (N, dg, Ho, Wo, K, 2)
    off_t = jnp.moveaxis(off_t, 4, 2)        # (N, dg, K, Ho, Wo, 2)
    mask_t = jnp.moveaxis(mask, 3, 1)        # (N, dg, Ho, Wo, K)
    mask_t = jnp.moveaxis(mask_t, 4, 2)      # (N, dg, K, Ho, Wo)
    w_g = weight.reshape(k, dg, cg, cout)    # cin == C when groups == 1
    w_g = jnp.moveaxis(w_g, 1, 0)            # (dg, K, cg, cout)
    dtype = x.dtype

    def tap(x4_g):
        def body(acc, tin):
            off_k, m_k, w_k, ky_k, kx_k = tin
            fy = oy[:, None] + ky_k + off_k[..., 0].astype(jnp.float32)
            fx = ox[None, :] + kx_k + off_k[..., 1].astype(jnp.float32)
            sampled = _slab_bilinear(x4_g, (h, w, cg), dtype, fy, fx)
            sampled = sampled * m_k[..., None]        # (Ho, Wo, cg)
            return acc + jnp.einsum(
                'hwc,co->hwo', sampled, w_k,
                preferred_element_type=jnp.float32), None
        return body

    def grp(acc, ginp):
        x4_g, off_g, m_g, w_gg = ginp
        acc, _ = jax.lax.scan(_tap_checkpoint(tap(x4_g)), acc,
                              (off_g, m_g, w_gg, ky, kx))
        return acc, None

    def item(_, inp):
        x4_i, off_i, m_i = inp
        acc0 = jnp.zeros((ho, wo, cout), jnp.float32)
        out_i, _ = jax.lax.scan(grp, acc0, (x4_i, off_i, m_i, w_g))
        return None, out_i

    _, out = jax.lax.scan(item, None, (x4, off_t, mask_t))
    return out  # (N, Ho, Wo, cout) f32


def _corner_rows_and_weights(fy, fx, h, w, dtype):
    """Shared bilinear math of both DCN gather paths: clipped corner row
    coords (into the corner-packed table, cf. _pack_bilinear_corners)
    and the 4 validity-masked corner weights. Validity is judged on the
    UNclipped corner coords, the row index on clipped ones (mmcv
    zero-outside semantics)."""
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy1 = (fy - y0).astype(dtype)
    wx1 = (fx - x0).astype(dtype)
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1
    vy0 = ((y0 >= 0) & (y0 <= h - 1)).astype(dtype)
    vy1 = ((y0 >= -1) & (y0 <= h - 2)).astype(dtype)
    vx0 = ((x0 >= 0) & (x0 <= w - 1)).astype(dtype)
    vx1 = ((x0 >= -1) & (x0 <= w - 2)).astype(dtype)
    yc = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
    xc = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
    ws = (wy0 * wx0 * vy0 * vx0,
          wy0 * wx1 * vy0 * vx1,
          wy1 * wx0 * vy1 * vx0,
          wy1 * wx1 * vy1 * vx1)
    return yc, xc, ws


def _combine_corners(g4, ws, cg):
    """Weighted sum of the 4 packed corners via LANE slices of the
    gathered row: a (..., 4, cg) reshape + einsum here forces a
    transposed VMEM copy of every gathered row; the slice form measured
    fastest (a fused 4x-tiled-weight matmul variant was 1.7x SLOWER —
    the extra MACs and the weight-row broadcast cost more than the
    copies saved)."""
    return sum(g4[:, i * cg:(i + 1) * cg] * w.reshape(-1, 1)
               for i, w in enumerate(ws))


def _slab_bilinear(x4_g, dims, dtype, fy, fx):
    """Bilinear sample from ONE (item, group) corner-packed slab.

    x4_g: ((H+1)(W+1), 4*cg); fy/fx: (Ho, Wo). Returns (Ho, Wo, cg).
    """
    h, w, cg = dims
    yc, xc, ws = _corner_rows_and_weights(fy, fx, h, w, dtype)
    rows = yc * (w + 1) + xc
    g4 = checkpoint_name(
        jnp.take(x4_g, rows.reshape(-1), axis=0),  # (Ho*Wo, 4*cg)
        'dcn_gather')
    out = _combine_corners(g4, ws, cg)
    return out.reshape(fy.shape + (cg,))


def _mdcn_tap_scan(x, offset, mask, weight, dims, oy, ox, ky, kx):
    """General (conv groups > 1) DCNv2 path: scan over the K kernel taps,
    accumulating each tap's (gather x weight-slice) matmul, with the
    2x2 bilinear corners pre-packed into one gathered row per sampling
    point (4x fewer rows than corner-at-a-time)."""
    n, h, w, ho, wo, k, dg, cg, cout, groups, cin_g = dims
    x4 = _pack_bilinear_corners(x, dg).reshape(
        n * dg * (h + 1) * (w + 1), 4 * cg)
    offset_t = jnp.moveaxis(offset, -2, 0)  # (K,N,Ho,Wo,dg,2)
    mask_t = jnp.moveaxis(mask, -1, 0)      # (K,N,Ho,Wo,dg)
    w_t = weight.reshape(k, cin_g, cout)

    def tap(acc, inp):
        off_k, m_k, w_k, ky_k, kx_k = inp
        fy_k = (oy[None, :, None, None] + ky_k
                + off_k[..., 0].astype(jnp.float32))
        fx_k = (ox[None, None, :, None] + kx_k
                + off_k[..., 1].astype(jnp.float32))
        sampled = _deform_gather_tap_packed(
            x4, (n, h, w, dg, cg), x.dtype, fy_k, fx_k)  # (N,Ho,Wo,dg,cg)
        sampled = sampled * m_k[..., None]
        sg = sampled.reshape(n, ho, wo, groups, cin_g)
        wg = w_k.reshape(cin_g, groups, cout // groups)
        acc = acc + jnp.einsum(
            'nhwgc,cgo->nhwgo', sg, wg,
            preferred_element_type=jnp.float32).reshape(
                n, ho, wo, cout)
        return acc, None

    acc0 = jnp.zeros((n, ho, wo, cout), jnp.float32)
    out, _ = jax.lax.scan(_tap_checkpoint(tap), acc0,
                          (offset_t, mask_t, w_t, ky, kx))
    return out


def _pack_bilinear_corners(x, dg):
    """Pack the 2x2 bilinear corners of every (pixel, deform group) into
    one flat row, slab-major per (item, group).

    x: (N,H,W,C). Returns (N, dg, (H+1)*(W+1), 4*cg) where row
    (b, g, yi*(W+1)+xi) holds [xp[yi,xi] | xp[yi,xi+1] | xp[yi+1,xi] |
    xp[yi+1,xi+1]] of group g's channels, with xp = x zero-padded by 1 on
    every spatial side. Row (y0+1, x0+1) is exactly the 2x2 patch a
    bilinear sample at floor coords (y0, x0) needs, for y0 in [-1, H-1].
    """
    n, h, w, c = x.shape
    cg = c // dg
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(n, h + 2, w + 2, dg, cg)
    x4 = jnp.concatenate([
        xp[:, :h + 1, :w + 1],
        xp[:, :h + 1, 1:],
        xp[:, 1:, :w + 1],
        xp[:, 1:, 1:],
    ], axis=-1)  # (N, H+1, W+1, dg, 4*cg)
    x4 = jnp.moveaxis(x4, 3, 1)  # (N, dg, H+1, W+1, 4*cg)
    return x4.reshape(n, dg, (h + 1) * (w + 1), 4 * cg)


def _deform_gather_tap_packed(x4, dims, dtype, fy, fx):
    """Bilinear gather at float coords for ONE kernel tap, from
    corner-packed rows (see _pack_bilinear_corners).

    x4: (N*dg*(H+1)*(W+1), 4*cg) slab-major per (item, group);
    fy/fx: (N,Ho,Wo,dg).
    Returns (N,Ho,Wo,dg,cg). Zero outside the [-1, dim] boundary like the
    CUDA kernel (corners outside contribute 0): a fully out-of-range
    sample lands on a real row but is masked to zero
    (_corner_rows_and_weights).
    """
    n, h, w, dg, cg = dims
    yc, xc, ws = _corner_rows_and_weights(fy, fx, h, w, dtype)
    bidx = jnp.arange(n).reshape(n, 1, 1, 1)
    gidx = jnp.arange(dg).reshape(1, 1, 1, dg)
    rows = (bidx * dg + gidx) * ((h + 1) * (w + 1)) + yc * (w + 1) + xc
    g4 = checkpoint_name(
        jnp.take(x4, rows.reshape(-1), axis=0),  # (N*Ho*Wo*dg, 4*cg)
        'dcn_gather')
    out = _combine_corners(g4, ws, cg)
    return out.reshape(fy.shape + (cg,))


def deform_sample(x, flow):
    """Per-pixel grouped bilinear sampling (the flow-warp fast-alignment
    primitive): group g of the output at (y, x) is group g of ``x``
    bilinearly sampled at (y, x) + flow[n, y, x, g].

    This is the K=1 special case of the deformable gather: ONE
    corner-packed row per (pixel, group) instead of the DCN's 9 kernel
    taps — 9x fewer rows through the platform's gather unit, the
    measured step bottleneck (docs/TPUDesign.md "Known TPU bottleneck").
    Same (item, group) VMEM-slab scan as _mdcn_slab_scan, with the same
    per-group checkpoint policy (the backward re-gathers from the slab
    unless MREFSR_DCN_SAVE_GATHER saves the corner rows); zero outside
    the boundary (mmcv corner semantics).

    Args:
        x: (N, H, W, C).
        flow: (N, H, W, dg, 2), last dim (dy, dx); C % dg == 0.

    Returns:
        (N, H, W, C), group g's channels warped by flow group g.
    """
    n, h, w, c = x.shape
    dg = flow.shape[3]
    assert flow.shape == (n, h, w, dg, 2), (
        f'flow shape {flow.shape} != {(n, h, w, dg, 2)}')
    assert c % dg == 0
    cg = c // dg
    x4 = _pack_bilinear_corners(x, dg)      # (N, dg, (H+1)(W+1), 4*cg)
    flow_t = jnp.moveaxis(flow, 3, 1)       # (N, dg, H, W, 2)
    # f32 coordinates: bf16 flow above position 256 quantizes to ulp 2
    oy = jnp.arange(h, dtype=jnp.float32)
    ox = jnp.arange(w, dtype=jnp.float32)

    def grp(_, ginp):
        x4_g, f_g = ginp                    # ((H+1)(W+1), 4cg), (H, W, 2)
        fy = oy[:, None] + f_g[..., 0].astype(jnp.float32)
        fx = ox[None, :] + f_g[..., 1].astype(jnp.float32)
        return None, _slab_bilinear(x4_g, (h, w, cg), x.dtype, fy, fx)

    def item(_, inp):
        x4_i, f_i = inp
        _, out_i = jax.lax.scan(_tap_checkpoint(grp), None,
                                (x4_i, f_i))  # (dg, H, W, cg)
        return None, out_i

    _, out = jax.lax.scan(item, None, (x4, flow_t))      # (N, dg, H, W, cg)
    return jnp.moveaxis(out, 1, 3).reshape(n, h, w, c)


def deform_conv2d(x, offset, weight, stride=1, padding=0, dilation=1,
                  groups=1, deform_groups=1):
    """DCNv1 (unmodulated) deformable conv — the maskless specialization
    of :func:`modulated_deform_conv2d`.

    Matches the reference ops surface `DeformConv`/`deform_conv`
    (reference basicsr/ops/dcn/deform_conv.py:188-247): identical
    sampling semantics to the modulated form with mask ≡ 1 and no bias
    (the reference's DeformConv asserts ``not bias``). No registered
    arch uses v1 — this exists for ops-surface parity.

    Args:
        x: (N, H, W, C) input.
        offset: (N, Ho, Wo, dg, K, 2) per-tap (dy, dx) offsets.
        weight: (kh, kw, C // groups, Cout).
    """
    n, ho, wo, dg, k, _ = offset.shape
    assert dg == deform_groups
    mask = jnp.ones((n, ho, wo, dg, k), x.dtype)
    return modulated_deform_conv2d(
        x, offset, mask, weight, bias=None, stride=stride, padding=padding,
        dilation=dilation, groups=groups, deform_groups=deform_groups)


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
