"""MRAPA multi-reference restoration network, flax/NHWC.

Behavioral rebuild of reference
basicsr/archs/ref_mrapa_restoration_arch.py: an SRNTT-style 3-scale
decoder where at each VGG level (relu3_1 256ch / relu2_1 128ch /
relu1_1 64ch) every reference is aligned by a DynAgg deformable conv
seeded with precomputed match offsets, the T aligned refs are fused by
per-pixel cross-attention (MRAPAFusion), and x2 PixelShuffle moves
between scales; a bilinear x4 global residual closes the net.

TPU idiom changes vs the reference:
  * refs ride a stacked (B, T, ...) axis; the per-ref python loops
    (reference :216-253) become one ``nn.scan`` over the T axis with
    params broadcast — a single compiled alignment body reused for
    every ref, holding only one ref's offset/DCN intermediates live at
    a time (this is what fits CUFED5's 500x500 padded eval in HBM).
  * the per-pixel 1xT attention (reference MRAPAFusion:313-335, a
    permute/flatten dance) is two einsums + softmax.
"""
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrefsr_tpu.ops import deform_sample, interpolate, \
    modulated_deform_conv2d, offset_mask_from_conv_out, pixel_shuffle
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .arch_util import PReLU, ResidualBlockNoBN, run_blocks, \
    srntt_normal_init


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


class DynAgg(nn.Module):
    """Deformable aggregation seeded with precomputed non-local offsets
    (reference ref_mrapa_restoration_arch.py:11-76).

    Call: (x, feat, pre_offset) where x is the ref feature to sample,
    feat drives conv_offset_mask, and pre_offset is (N, H, W, 9, 2) with
    last dim (x, y) from correspondence generation.
    """
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    deform_groups: int = 8

    @nn.compact
    def __call__(self, x, feat, pre_offset):
        k = self.kernel_size
        dg = self.deform_groups
        # zero init = the reference's re_init_dcn_offset
        # (ref_mrapa_restoration_arch.py:114-121): learned offsets start
        # at 0 so sampling begins exactly at the precomputed pre_offset
        out = nn.Conv(dg * 3 * k * k, (k, k),
                      strides=(self.stride, self.stride),
                      padding=self.padding,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name='conv_offset_mask')(feat)
        offset, mask = offset_mask_from_conv_out(out, dg, (k, k))
        mask = jax.nn.sigmoid(mask)
        # learned-residual health warning (reference :70-73 — which
        # references an undefined `logger`; fixed here, jit-safe)
        import os as _os
        if _os.environ.get('MREFSR_DEBUG_OFFSETS'):
            # opt-in: jax.debug.print needs host callbacks, which some
            # TPU runtimes (e.g. the axon tunnel) do not support
            residual_absmean = jnp.abs(offset).mean()
            jax.lax.cond(
                residual_absmean > 50,
                lambda m: jax.debug.print(
                    'Offset abs mean is {m}, larger than 50.', m=m),
                lambda m: None, residual_absmean)
        # seed with the precomputed offsets: broadcast over deform groups,
        # (x, y) -> (dy, dx) (reference :59-66)
        pre = jnp.stack([pre_offset[..., 1], pre_offset[..., 0]],
                        axis=-1)  # (N,H,W,9,2) now (dy,dx)
        offset = offset + pre[:, :, :, None, :, :]

        cin_g = self.in_channels // self.groups
        weight = self.param(
            'kernel', srntt_normal_init(0.02),
            (k, k, cin_g, self.out_channels))
        bias = self.param('bias', nn.initializers.zeros,
                          (self.out_channels,))
        return modulated_deform_conv2d(
            x, offset, mask, weight, bias, stride=self.stride,
            padding=self.padding, dilation=self.dilation,
            groups=self.groups, deform_groups=dg)


class FlowAgg(nn.Module):
    """Flow-warp aggregation: the TPU-fast alternative to DynAgg.

    Same call contract as DynAgg (x, feat, pre_offset), but instead of a
    9-tap deformable conv it predicts ONE per-pixel per-deform-group
    flow residual + gate, warps the ref feature with a single grouped
    bilinear sample (ops.deform_sample — 9x fewer rows through the
    gather unit, the measured step bottleneck), then applies a dense
    3x3 conv on the MXU. The flow is seeded with the center-tap
    precomputed match offset and the head is zero-initialized, so
    sampling starts exactly at the correspondence like DynAgg's
    re_init_dcn_offset.

    NOT checkpoint-compatible with the reference's DCN alignment —
    opt-in via ``network_g: alignment: flow`` and requires training
    from scratch (or fine-tuning) under the new parameterization.
    """
    in_channels: int
    out_channels: int
    deform_groups: int = 8

    @nn.compact
    def __call__(self, x, feat, pre_offset):
        dg = self.deform_groups
        n, h, w, c = x.shape
        assert c == self.in_channels, (
            f'FlowAgg expected in_channels={self.in_channels}, got {c}')
        cg = c // dg
        head = nn.Conv(dg * 3, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name='conv_flow_gate')(feat)
        flow_res = head[..., :dg * 2].reshape(n, h, w, dg, 2)  # (dy,dx)
        gate = jax.nn.sigmoid(head[..., dg * 2:])              # (n,h,w,dg)
        # seed with the center tap (k=4 of the 9 row-major 3x3 taps) of
        # the precomputed match offsets, (x, y) -> (dy, dx)
        pre = jnp.stack([pre_offset[..., 4, 1], pre_offset[..., 4, 0]],
                        axis=-1)                               # (n,h,w,2)
        flow = flow_res + pre[:, :, :, None, :]
        warped = deform_sample(x, flow)                        # (n,h,w,c)
        warped = (warped.reshape(n, h, w, dg, cg)
                  * gate[..., None]).reshape(n, h, w, c)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       kernel_init=srntt_normal_init(0.02),
                       name='conv_after_warp')(warped)


class ContentExtractor(nn.Module):
    """LR content tower: conv + n residual blocks
    (reference ref_mrapa_restoration_arch.py:79-98)."""
    nf: int = 64
    n_blocks: int = 16

    @nn.compact
    def __call__(self, x):
        # the reference's srntt_init_weights(self, 'normal', 0.02) runs
        # over the WHOLE net (ref_mrapa_restoration_arch.py:111) AFTER
        # ContentExtractor's default_init — every conv, residual blocks
        # included, starts at N(0, 0.02)
        feat = _lrelu(nn.Conv(self.nf, (3, 3), padding=1,
                              kernel_init=srntt_normal_init(0.02),
                              name='conv_first')(x))
        return run_blocks(feat, ResidualBlockNoBN, self.n_blocks, 'body',
                          num_feat=self.nf,
                          kernel_init=srntt_normal_init(0.02))


class MRAPAFusion(nn.Module):
    """Relevance-embedded per-pixel attention over T aligned refs + spatial
    attention (reference ref_mrapa_restoration_arch.py:262-348).

    Call: (target (B,H,W,nf), refs (B,T,H,W,ref_nf)).
    """
    nf: int = 64
    ref_nf: int = 256

    @nn.compact
    def __call__(self, target, refs):
        init = srntt_normal_init(0.02)
        b, t = refs.shape[0], refs.shape[1]
        h_input, w_input = target.shape[1], target.shape[2]
        channels = self.ref_nf
        ps = 3

        # reflect-pad H,W to multiple of 4 (reference :306-311)
        pad_h = (4 - h_input % 4) % 4
        pad_w = (4 - w_input % 4) % 4
        if pad_h or pad_w:
            target = jnp.pad(target, ((0, 0), (0, pad_h), (0, pad_w),
                                      (0, 0)), mode='reflect')
            refs = jnp.pad(refs, ((0, 0), (0, 0), (0, pad_h), (0, pad_w),
                                  (0, 0)), mode='reflect')
        refs_flat = refs.reshape((b * t,) + refs.shape[2:])

        # multi-ref attention
        emb_t = nn.Conv(channels, (1, 1), kernel_init=init,
                        name='conv_emb1.0')(target)
        emb_t = PReLU(name='conv_emb1.1')(emb_t) * (channels ** -0.5)
        emb_r = nn.Conv(channels, (ps, ps), padding=ps // 2,
                        kernel_init=init, name='conv_emb2.0')(refs_flat)
        emb_r = PReLU(name='conv_emb2.1')(emb_r)
        emb_r = emb_r.reshape((b, t) + emb_r.shape[1:])  # (B,T,H,W,C)
        ass = nn.Conv(channels * 2, (ps, ps), padding=ps // 2,
                      kernel_init=init, name='conv_ass')(refs_flat)
        ass = ass.reshape((b, t) + ass.shape[1:])  # (B,T,H,W,2C)

        # Attention einsums emit the COMPUTE dtype (bf16 under the
        # mixed-precision policy): the MXU accumulates bf16 dot
        # products in f32 in hardware either way, so forcing
        # preferred_element_type=f32 here only changed the OUTPUT
        # dtype — which the VJP inherits, storing every attention
        # cotangent ((B*T,H,W,2C) 'ass' + (B*T,H,W,C) 'emb_r' slabs,
        # the largest tensors in the step) in f32. Measured: dropping
        # it cuts peak HBM by the cotangent set and speeds the flow
        # step (docs/TPUDesign.md round-5 section). The softmax itself
        # stays f32: its (B,H,W,T) operand is tiny and exp/normalize
        # precision is worth keeping.
        corr = jnp.einsum('nhwc,nthwc->nhwt', emb_t, emb_r)
        corr = jax.nn.softmax(corr.astype(jnp.float32),
                              axis=-1).astype(target.dtype)
        fused_refs = jnp.einsum('nhwt,nthwc->nhwc', corr,
                                ass)  # (B,H,W,2C)

        # spatial attention (reference :337-344)
        attn = _lrelu(nn.Conv(channels * 2, (1, 1), kernel_init=init,
                              name='spatial_attn')(
            jnp.concatenate([target, fused_refs], -1)))
        attn_mul = nn.Conv(channels * 2, (3, 3), padding=1, kernel_init=init,
                           name='spatial_attn_mul2')(
            _lrelu(nn.Conv(channels * 2, (3, 3), padding=1,
                           kernel_init=init,
                           name='spatial_attn_mul1')(attn)))
        attn_add = nn.Conv(channels * 2, (3, 3), padding=1, kernel_init=init,
                           name='spatial_attn_add2')(
            _lrelu(nn.Conv(channels * 2, (3, 3), padding=1,
                           kernel_init=init,
                           name='spatial_attn_add1')(attn)))
        attn_mul = jax.nn.sigmoid(attn_mul)
        # *2 keeps the post-init expectation near 1 (reference :343)
        fused_refs = fused_refs * attn_mul * 2 + attn_add

        feat = _lrelu(nn.Conv(self.nf, (1, 1), kernel_init=init,
                              name='feat_fusion')(
            jnp.concatenate([target, fused_refs], -1)))
        return feat[:, :h_input, :w_input, :]


def _align_one_ref(mdl, carry, per_ref, ref_nf, groups, prefix,
                   dcn_outer_remat=False, alignment='dcn'):
    """Align ONE reference against the target features (the scanned body
    of a decoder scale). Params attach to ``mdl``'s scope with the same
    flat names as the reference's modules and are broadcast across the
    scan, so only one ref's offset/DCN intermediates are ever live — the
    key to fitting CUFED5's 500x500 padded eval (and the train step) in
    one chip's HBM."""
    init = srntt_normal_init(0.02)
    x = carry
    ref_feat_1, pre_offset_1 = per_ref
    p = prefix
    offset_in = jnp.concatenate([x, ref_feat_1], axis=-1)
    off = _lrelu(nn.Conv(ref_nf, (3, 3), padding=1, kernel_init=init,
                         name=f'{p}_offset_conv1')(offset_in))
    off = _lrelu(nn.Conv(ref_nf, (3, 3), padding=1, kernel_init=init,
                         name=f'{p}_offset_conv2')(off))
    # Remat policy (dcn_outer_remat, YAML network_g key): the default
    # keeps DynAgg's inner-checkpoint residuals (small: per-tap offsets
    # + packed corner slabs) so the backward re-runs each tap ONCE —
    # the per-tap checkpoint in ops/dcn.py alone bounds the im2col
    # footprint. dcn_outer_remat=true additionally wraps DynAgg in
    # nn.remat, discarding those residuals and replaying the whole
    # alignment forward in the backward pass — one extra full gather
    # pass per step through the bottleneck gather unit. Measured
    # (stage3 bench, v5e): default 9.97 img/s/chip at b=8 / 9.05 at
    # b=4 vs 9.44 / 8.76 with the outer remat. Set it true only when
    # HBM is the binding constraint (e.g. large-patch gt=300 training).
    if alignment == 'flow':
        agg_cls = nn.remat(FlowAgg) if dcn_outer_remat else FlowAgg
        swapped = _lrelu(agg_cls(ref_nf, ref_nf, deform_groups=groups,
                                 name=f'{p}_flow_agg')(
            ref_feat_1, off, pre_offset_1))
        return carry, swapped
    dyn_agg_cls = nn.remat(DynAgg) if dcn_outer_remat else DynAgg
    swapped = _lrelu(dyn_agg_cls(ref_nf, ref_nf, 3,
                                 deform_groups=groups,
                                 name=f'{p}_dyn_agg')(
        ref_feat_1, off, pre_offset_1))
    return carry, swapped


def _scale_stage(mdl, x, pre_offset, ref_feat, nf, ref_nf, n_blocks,
                 groups, prefix, ref_unroll=1, dcn_outer_remat=False,
                 fusion_remat=False, alignment='dcn'):
    """One decoder scale: per-ref alignment scanned over the T refs +
    fusion + residual body (shared structure of reference :213-257).
    Called with the owning module so scanned params attach flat,
    matching the reference's module names."""
    init = srntt_normal_init(0.02)
    p = prefix

    align = nn.scan(
        partial(_align_one_ref, ref_nf=ref_nf, groups=groups, prefix=p,
                dcn_outer_remat=dcn_outer_remat, alignment=alignment),
        variable_broadcast='params',
        variable_axes={'intermediates': 1},
        split_rngs={'params': False},
        in_axes=1, out_axes=1, unroll=ref_unroll)
    _, swapped = align(mdl, x, (ref_feat, pre_offset))  # (B,T,H,W,C)

    # fusion_remat (YAML network_g key): replay the MRAPA attention in
    # the backward instead of keeping its residuals. Measured (stage3
    # bench, v5e, b=8): default OFF 10.21 img/s/chip vs 9.97 with the
    # replay — set true only when HBM binds (the shipped gt=300
    # large-patch config does, alongside dcn_outer_remat).
    fusion_cls = nn.remat(MRAPAFusion) if fusion_remat else MRAPAFusion
    h = fusion_cls(nf=nf, ref_nf=ref_nf, name=f'head_{p}')(x, swapped)
    # srntt_init_weights covers these blocks too (see ContentExtractor)
    h = run_blocks(h, ResidualBlockNoBN, n_blocks, f'body_{p}',
                   num_feat=nf, kernel_init=init) + x

    if p in ('small', 'medium'):
        h = nn.Conv(nf * 4, (3, 3), padding=1, kernel_init=init,
                    name=f'tail_{p}.0')(h)
        h = _lrelu(pixel_shuffle(h, 2))
    else:  # large: conv -> lrelu -> conv to RGB
        h = _lrelu(nn.Conv(nf // 2, (3, 3), padding=1, kernel_init=init,
                           name=f'tail_{p}.0')(h))
        h = nn.Conv(3, (3, 3), padding=1, kernel_init=init,
                    name=f'tail_{p}.2')(h)
    return h


class DynamicAggregationRestoration(nn.Module):
    """3-scale decoder (reference :140-259). Multi-ref inputs are stacked:
    pre_offset {level: (B,T,H,W,9,2)}, ref feats {level: (B,T,H,W,C)}.

    ref_unroll unrolls the per-ref alignment scan (lax.scan unroll):
    1 = minimum live memory (one ref's DCN intermediates at a time),
    T = fully unrolled (lets XLA interleave one ref's gather-bound DCN
    with another's MXU work when HBM allows)."""
    ngf: int = 64
    n_blocks: int = 16
    groups: int = 8
    ref_unroll: int = 1
    dcn_outer_remat: bool = False
    fusion_remat: bool = False
    alignment: str = 'dcn'

    @nn.compact
    def __call__(self, x, pre_offset, img_ref_feat):
        x = _scale_stage(self, x, pre_offset['relu3_1'],
                         img_ref_feat['relu3_1'], self.ngf, 256,
                         self.n_blocks, self.groups, 'small',
                         self.ref_unroll, self.dcn_outer_remat,
                         self.fusion_remat, self.alignment)
        x = _scale_stage(self, x, pre_offset['relu2_1'],
                         img_ref_feat['relu2_1'], self.ngf, 128,
                         self.n_blocks, self.groups, 'medium',
                         self.ref_unroll, self.dcn_outer_remat,
                         self.fusion_remat, self.alignment)
        x = _scale_stage(self, x, pre_offset['relu1_1'],
                         img_ref_feat['relu1_1'], self.ngf, 64,
                         self.n_blocks, self.groups, 'large',
                         self.ref_unroll, self.dcn_outer_remat,
                         self.fusion_remat, self.alignment)
        return x


@ARCH_REGISTRY.register()
class MRAPARestorationNet(nn.Module):
    """The LMR 5-ref restoration net
    (reference ref_mrapa_restoration_arch.py:102-137).

    Call: (x (B,h,w,3) LR input, pre_offset {level: (B,T,H,W,9,2)},
    img_ref_feat {level: (B,T,H,W,C)}). Returns (B, 4h, 4w, 3).
    """
    ngf: int = 64
    n_blocks: int = 16
    groups: int = 8
    ref_unroll: int = 1
    dcn_outer_remat: bool = False
    fusion_remat: bool = False
    alignment: str = 'dcn'  # 'dcn' (reference-compatible) | 'flow' (fast)

    @nn.compact
    def __call__(self, x, pre_offset, img_ref_feat):
        base = interpolate(x, scale_factor=4, mode='bilinear',
                           align_corners=False)
        content_feat = ContentExtractor(self.ngf, self.n_blocks,
                                        name='content_extractor')(x)
        upscale = DynamicAggregationRestoration(
            self.ngf, self.n_blocks, self.groups, self.ref_unroll,
            self.dcn_outer_remat, self.fusion_remat, self.alignment,
            name='dyn_agg_restore')(content_feat, pre_offset, img_ref_feat)
        return upscale + base
