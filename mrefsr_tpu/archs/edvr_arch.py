"""EDVR: PCD alignment + TSA fusion video SR, flax/NHWC.

Behavioral rebuild of reference basicsr/archs/edvr_arch.py:9-383.
Frames ride a (B, T, H, W, C) axis; per-frame towers fold T into batch.
The deformable alignment reuses the shared DCNv2 op.
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrefsr_tpu.ops import interpolate, pixel_shuffle
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .arch_util import DCNv2Pack, ResidualBlockNoBN, run_blocks


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


def _up2(x):
    return interpolate(x, scale_factor=2, mode='bilinear',
                       align_corners=False)


class PCDAlignment(nn.Module):
    """Pyramid-cascading deformable alignment
    (reference edvr_arch.py:9-101). Module-dict children keep the torch
    names offset_conv1.l3 etc. via nested naming."""
    num_feat: int = 64
    deformable_groups: int = 8

    @nn.compact
    def __call__(self, nbr_feat_l, ref_feat_l):
        nf = self.num_feat
        upsampled_offset, upsampled_feat = None, None
        feat = None
        for i in range(3, 0, -1):
            level = f'l{i}'
            offset = jnp.concatenate([nbr_feat_l[i - 1],
                                      ref_feat_l[i - 1]], -1)
            offset = _lrelu(nn.Conv(nf, (3, 3), padding=1,
                                    name=f'offset_conv1.{level}')(offset))
            if i == 3:
                offset = _lrelu(nn.Conv(
                    nf, (3, 3), padding=1,
                    name=f'offset_conv2.{level}')(offset))
            else:
                offset = _lrelu(nn.Conv(
                    nf, (3, 3), padding=1, name=f'offset_conv2.{level}')(
                    jnp.concatenate([offset, upsampled_offset], -1)))
                offset = _lrelu(nn.Conv(
                    nf, (3, 3), padding=1,
                    name=f'offset_conv3.{level}')(offset))

            feat = DCNv2Pack(nf, nf, 3, padding=1,
                             deformable_groups=self.deformable_groups,
                             name=f'dcn_pack.{level}')(
                nbr_feat_l[i - 1], offset)
            if i < 3:
                feat = nn.Conv(nf, (3, 3), padding=1,
                               name=f'feat_conv.{level}')(
                    jnp.concatenate([feat, upsampled_feat], -1))
            if i > 1:
                feat = _lrelu(feat)
                upsampled_offset = _up2(offset) * 2
                upsampled_feat = _up2(feat)

        offset = jnp.concatenate([feat, ref_feat_l[0]], -1)
        offset = _lrelu(nn.Conv(nf, (3, 3), padding=1,
                                name='cas_offset_conv2')(
            _lrelu(nn.Conv(nf, (3, 3), padding=1,
                           name='cas_offset_conv1')(offset))))
        feat = _lrelu(DCNv2Pack(nf, nf, 3, padding=1,
                                deformable_groups=self.deformable_groups,
                                name='cas_dcnpack')(feat, offset))
        return feat


def _max_pool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1),
                                                           (1, 1)))


def _avg_pool3s2(x):
    """AvgPool2d(3, stride=2, padding=1) with count_include_pad=True
    (torch default)."""
    summed = nn.pool(x, 0., jax.lax.add, (3, 3), (2, 2),
                     ((1, 1), (1, 1)))
    return summed / 9.


class TSAFusion(nn.Module):
    """Temporal-spatial attention fusion (reference edvr_arch.py:104-211).

    Call: aligned_feat (B, T, H, W, C) -> (B, H, W, C).
    """
    num_feat: int = 64
    num_frame: int = 5
    center_frame_idx: int = 2

    @nn.compact
    def __call__(self, aligned_feat):
        nf = self.num_feat
        b, t, h, w, c = aligned_feat.shape
        # temporal attention
        emb_ref = nn.Conv(nf, (3, 3), padding=1, name='temporal_attn1')(
            aligned_feat[:, self.center_frame_idx])
        emb = nn.Conv(nf, (3, 3), padding=1, name='temporal_attn2')(
            aligned_feat.reshape(b * t, h, w, c))
        emb = emb.reshape(b, t, h, w, -1)

        corr = jnp.sum(emb * emb_ref[:, None], axis=-1)  # (b, t, h, w)
        corr_prob = jax.nn.sigmoid(corr)[..., None]  # (b, t, h, w, 1)
        feat = aligned_feat * corr_prob
        # channel-interleave ordering matters for the fusion conv:
        # torch flattens (t, c) into t*c channels
        feat = feat.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)

        fused = _lrelu(nn.Conv(nf, (1, 1), name='feat_fusion')(feat))

        # spatial attention
        attn = _lrelu(nn.Conv(nf, (1, 1), name='spatial_attn1')(feat))
        attn_max = _max_pool3s2(attn)
        attn_avg = _avg_pool3s2(attn)
        attn = _lrelu(nn.Conv(nf, (1, 1), name='spatial_attn2')(
            jnp.concatenate([attn_max, attn_avg], -1)))
        attn_level = _lrelu(nn.Conv(nf, (1, 1),
                                    name='spatial_attn_l1')(attn))
        attn_max = _max_pool3s2(attn_level)
        attn_avg = _avg_pool3s2(attn_level)
        attn_level = _lrelu(nn.Conv(nf, (3, 3), padding=1,
                                    name='spatial_attn_l2')(
            jnp.concatenate([attn_max, attn_avg], -1)))
        attn_level = _lrelu(nn.Conv(nf, (3, 3), padding=1,
                                    name='spatial_attn_l3')(attn_level))
        attn_level = _up2(attn_level)

        attn = _lrelu(nn.Conv(nf, (3, 3), padding=1,
                              name='spatial_attn3')(attn)) + attn_level
        attn = _lrelu(nn.Conv(nf, (1, 1), name='spatial_attn4')(attn))
        attn = _up2(attn)
        attn = nn.Conv(nf, (3, 3), padding=1, name='spatial_attn5')(attn)
        attn_add = nn.Conv(nf, (1, 1), name='spatial_attn_add2')(
            _lrelu(nn.Conv(nf, (1, 1), name='spatial_attn_add1')(attn)))
        attn = jax.nn.sigmoid(attn)

        return fused * attn * 2 + attn_add


class PredeblurModule(nn.Module):
    """(reference edvr_arch.py:214-264)"""
    num_in_ch: int = 3
    num_feat: int = 64
    hr_in: bool = False

    @nn.compact
    def __call__(self, x):
        nf = self.num_feat
        feat_l1 = _lrelu(nn.Conv(nf, (3, 3), padding=1,
                                 name='conv_first')(x))
        if self.hr_in:
            feat_l1 = _lrelu(nn.Conv(nf, (3, 3), strides=(2, 2),
                                     padding=1,
                                     name='stride_conv_hr1')(feat_l1))
            feat_l1 = _lrelu(nn.Conv(nf, (3, 3), strides=(2, 2),
                                     padding=1,
                                     name='stride_conv_hr2')(feat_l1))
        feat_l2 = _lrelu(nn.Conv(nf, (3, 3), strides=(2, 2), padding=1,
                                 name='stride_conv_l2')(feat_l1))
        feat_l3 = _lrelu(nn.Conv(nf, (3, 3), strides=(2, 2), padding=1,
                                 name='stride_conv_l3')(feat_l2))
        feat_l3 = _up2(ResidualBlockNoBN(nf, name='resblock_l3')(feat_l3))
        feat_l2 = ResidualBlockNoBN(nf, name='resblock_l2_1')(feat_l2) + \
            feat_l3
        feat_l2 = _up2(ResidualBlockNoBN(nf, name='resblock_l2_2')(
            feat_l2))
        for i in range(2):
            feat_l1 = ResidualBlockNoBN(nf, name=f'resblock_l1.{i}')(
                feat_l1)
        feat_l1 = feat_l1 + feat_l2
        for i in range(2, 5):
            feat_l1 = ResidualBlockNoBN(nf, name=f'resblock_l1.{i}')(
                feat_l1)
        return feat_l1


@ARCH_REGISTRY.register()
class EDVR(nn.Module):
    """(reference edvr_arch.py:247-383). Input (B, T, H, W, C) in [0,1];
    output (B, 4H, 4W, C) (or same res when hr_in)."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_frame: int = 5
    deformable_groups: int = 8
    num_extract_block: int = 5
    num_reconstruct_block: int = 10
    center_frame_idx: Any = None
    hr_in: bool = False
    with_predeblur: bool = False
    with_tsa: bool = True

    @nn.compact
    def __call__(self, x):
        nf = self.num_feat
        center = self.center_frame_idx if self.center_frame_idx is not \
            None else self.num_frame // 2
        b, t, h, w, c = x.shape
        x_center = x[:, center]

        flat = x.reshape(b * t, h, w, c)
        if self.with_predeblur:
            feat_l1 = PredeblurModule(num_feat=nf, hr_in=self.hr_in,
                                      name='predeblur')(flat)
            feat_l1 = nn.Conv(nf, (1, 1), name='conv_1x1')(feat_l1)
            if self.hr_in:
                h, w = h // 4, w // 4
        else:
            feat_l1 = _lrelu(nn.Conv(nf, (3, 3), padding=1,
                                     name='conv_first')(flat))
        feat_l1 = run_blocks(feat_l1, ResidualBlockNoBN,
                             self.num_extract_block, 'feature_extraction',
                             num_feat=nf)
        feat_l2 = _lrelu(nn.Conv(nf, (3, 3), strides=(2, 2), padding=1,
                                 name='conv_l2_1')(feat_l1))
        feat_l2 = _lrelu(nn.Conv(nf, (3, 3), padding=1,
                                 name='conv_l2_2')(feat_l2))
        feat_l3 = _lrelu(nn.Conv(nf, (3, 3), strides=(2, 2), padding=1,
                                 name='conv_l3_1')(feat_l2))
        feat_l3 = _lrelu(nn.Conv(nf, (3, 3), padding=1,
                                 name='conv_l3_2')(feat_l3))

        feat_l1 = feat_l1.reshape(b, t, h, w, -1)
        feat_l2 = feat_l2.reshape(b, t, h // 2, w // 2, -1)
        feat_l3 = feat_l3.reshape(b, t, h // 4, w // 4, -1)

        ref_feat_l = [feat_l1[:, center], feat_l2[:, center],
                      feat_l3[:, center]]
        pcd = PCDAlignment(num_feat=nf,
                           deformable_groups=self.deformable_groups,
                           name='pcd_align')
        aligned = [pcd([feat_l1[:, i], feat_l2[:, i], feat_l3[:, i]],
                       ref_feat_l) for i in range(t)]
        aligned_feat = jnp.stack(aligned, axis=1)  # (b, t, h, w, c)

        if self.with_tsa:
            feat = TSAFusion(num_feat=nf, num_frame=self.num_frame,
                             center_frame_idx=center,
                             name='fusion')(aligned_feat)
        else:
            flatc = aligned_feat.transpose(0, 2, 3, 1, 4).reshape(
                b, h, w, t * nf)
            feat = nn.Conv(nf, (1, 1), name='fusion')(flatc)

        out = run_blocks(feat, ResidualBlockNoBN,
                         self.num_reconstruct_block, 'reconstruction',
                         num_feat=nf)
        out = _lrelu(pixel_shuffle(nn.Conv(nf * 4, (3, 3), padding=1,
                                           name='upconv1')(out), 2))
        out = _lrelu(pixel_shuffle(nn.Conv(64 * 4, (3, 3), padding=1,
                                           name='upconv2')(out), 2))
        out = _lrelu(nn.Conv(64, (3, 3), padding=1, name='conv_hr')(out))
        out = nn.Conv(3, (3, 3), padding=1, name='conv_last')(out)
        if self.hr_in:
            base = x_center
        else:
            base = interpolate(x_center, scale_factor=4, mode='bilinear',
                               align_corners=False)
        return out + base


class EDVRFeatureExtractor(nn.Module):
    """EDVR-based keyframe feature extractor for IconVSR
    (reference basicvsr_arch.py:273-336)."""
    num_input_frame: int
    num_feat: int

    @nn.compact
    def __call__(self, x):
        nf = self.num_feat
        center = self.num_input_frame // 2
        b, t, h, w, c = x.shape
        flat = x.reshape(b * t, h, w, c)
        feat_l1 = _lrelu(nn.Conv(nf, (3, 3), padding=1,
                                 name='conv_first')(flat))
        feat_l1 = run_blocks(feat_l1, ResidualBlockNoBN, 5,
                             'feature_extraction', num_feat=nf)
        feat_l2 = _lrelu(nn.Conv(nf, (3, 3), strides=(2, 2), padding=1,
                                 name='conv_l2_1')(feat_l1))
        feat_l2 = _lrelu(nn.Conv(nf, (3, 3), padding=1,
                                 name='conv_l2_2')(feat_l2))
        feat_l3 = _lrelu(nn.Conv(nf, (3, 3), strides=(2, 2), padding=1,
                                 name='conv_l3_1')(feat_l2))
        feat_l3 = _lrelu(nn.Conv(nf, (3, 3), padding=1,
                                 name='conv_l3_2')(feat_l3))

        feat_l1 = feat_l1.reshape(b, t, h, w, -1)
        feat_l2 = feat_l2.reshape(b, t, h // 2, w // 2, -1)
        feat_l3 = feat_l3.reshape(b, t, h // 4, w // 4, -1)

        ref_feat_l = [feat_l1[:, center], feat_l2[:, center],
                      feat_l3[:, center]]
        pcd = PCDAlignment(num_feat=nf, deformable_groups=8,
                           name='pcd_align')
        aligned = [pcd([feat_l1[:, i], feat_l2[:, i], feat_l3[:, i]],
                       ref_feat_l) for i in range(t)]
        aligned_feat = jnp.stack(aligned, axis=1)
        return TSAFusion(num_feat=nf, num_frame=self.num_input_frame,
                         center_frame_idx=center,
                         name='fusion')(aligned_feat)
