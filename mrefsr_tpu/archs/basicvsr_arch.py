"""BasicVSR / IconVSR recurrent video SR, flax/NHWC.

Behavioral rebuild of reference basicsr/archs/basicvsr_arch.py:12-336.
Frames: (B, T, H, W, C). The bidirectional propagation keeps the
reference's python loop over frames (T is static per config; the graph
unrolls, which XLA pipelines well at VSR's typical T<=15).
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrefsr_tpu.ops import flow_warp, interpolate, pixel_shuffle
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .arch_util import ResidualBlockNoBN, run_blocks
from .edvr_arch import EDVRFeatureExtractor
from .spynet_arch import SpyNet


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


class ConvResidualBlocks(nn.Module):
    """conv + lrelu + n resblocks (reference basicvsr_arch.py:103-118).
    Children main.0 (conv), main.2.{i} (blocks)."""
    num_out_ch: int = 64
    num_block: int = 15

    @nn.compact
    def __call__(self, x):
        x = _lrelu(nn.Conv(self.num_out_ch, (3, 3), padding=1,
                           name='main.0')(x))
        return run_blocks(x, ResidualBlockNoBN, self.num_block, 'main.2',
                          num_feat=self.num_out_ch)


@ARCH_REGISTRY.register()
class BasicVSR(nn.Module):
    """(reference basicvsr_arch.py:12-100). x4 only."""
    num_feat: int = 64
    num_block: int = 15
    spynet_path: Any = None

    @nn.compact
    def __call__(self, x):
        b, n, h, w, c = x.shape
        spynet = SpyNet(name='spynet')

        x1 = x[:, :-1].reshape(-1, h, w, c)
        x2 = x[:, 1:].reshape(-1, h, w, c)
        flows_backward = spynet(x1, x2).reshape(b, n - 1, h, w, 2)
        flows_forward = spynet(x2, x1).reshape(b, n - 1, h, w, 2)

        backward_trunk = ConvResidualBlocks(self.num_feat, self.num_block,
                                            name='backward_trunk')
        forward_trunk = ConvResidualBlocks(self.num_feat, self.num_block,
                                           name='forward_trunk')
        # shared heads: create once, call per frame (weight sharing)
        fusion = nn.Conv(self.num_feat, (1, 1), name='fusion')
        upconv1 = nn.Conv(self.num_feat * 4, (3, 3), padding=1,
                          name='upconv1')
        upconv2 = nn.Conv(64 * 4, (3, 3), padding=1, name='upconv2')
        conv_hr = nn.Conv(64, (3, 3), padding=1, name='conv_hr')
        conv_last = nn.Conv(3, (3, 3), padding=1, name='conv_last')

        # backward branch
        out_l = [None] * n
        feat_prop = jnp.zeros((b, h, w, self.num_feat), x.dtype)
        for i in range(n - 1, -1, -1):
            x_i = x[:, i]
            if i < n - 1:
                feat_prop = flow_warp(feat_prop, flows_backward[:, i])
            feat_prop = backward_trunk(
                jnp.concatenate([x_i, feat_prop], -1))
            out_l[i] = feat_prop

        # forward branch
        feat_prop = jnp.zeros_like(feat_prop)
        outs = []
        for i in range(n):
            x_i = x[:, i]
            if i > 0:
                feat_prop = flow_warp(feat_prop, flows_forward[:, i - 1])
            feat_prop = forward_trunk(
                jnp.concatenate([x_i, feat_prop], -1))

            out = jnp.concatenate([out_l[i], feat_prop], -1)
            out = _lrelu(fusion(out))
            out = _lrelu(pixel_shuffle(upconv1(out), 2))
            out = _lrelu(pixel_shuffle(upconv2(out), 2))
            out = _lrelu(conv_hr(out))
            out = conv_last(out)
            base = interpolate(x_i, scale_factor=4, mode='bilinear',
                               align_corners=False)
            outs.append(out + base)
        return jnp.stack(outs, axis=1)


@ARCH_REGISTRY.register()
class IconVSR(nn.Module):
    """(reference basicvsr_arch.py:120-270)."""
    num_feat: int = 64
    num_block: int = 15
    keyframe_stride: int = 5
    temporal_padding: int = 2
    spynet_path: Any = None
    edvr_path: Any = None

    @nn.compact
    def __call__(self, x):
        b, n, h_input, w_input, c = x.shape
        nf = self.num_feat

        # pad spatial to multiple of 4 (reference :170-191)
        pad_h = (4 - h_input % 4) % 4
        pad_w = (4 - w_input % 4) % 4
        if pad_h or pad_w:
            flat = x.reshape(-1, h_input, w_input, c)
            flat = jnp.pad(flat, ((0, 0), (0, pad_h), (0, pad_w),
                                  (0, 0)), mode='reflect')
            x = flat.reshape(b, n, h_input + pad_h, w_input + pad_w, c)
        h, w = x.shape[2], x.shape[3]

        keyframe_idx = list(range(0, n, self.keyframe_stride))
        if keyframe_idx[-1] != n - 1:
            keyframe_idx.append(n - 1)

        spynet = SpyNet(name='spynet')
        x1 = x[:, :-1].reshape(-1, h, w, c)
        x2 = x[:, 1:].reshape(-1, h, w, c)
        flows_backward = spynet(x1, x2).reshape(b, n - 1, h, w, 2)
        flows_forward = spynet(x2, x1).reshape(b, n - 1, h, w, 2)

        # keyframe features via EDVR (reference :205-217)
        tp = self.temporal_padding
        if tp == 2:
            x_pad = jnp.concatenate([x[:, [4, 3]], x, x[:, [-4, -5]]], 1)
        elif tp == 3:
            x_pad = jnp.concatenate([x[:, [6, 5, 4]], x,
                                     x[:, [-5, -6, -7]]], 1)
        else:
            raise ValueError(f'temporal_padding {tp} not supported')
        num_frames = 2 * tp + 1
        edvr = EDVRFeatureExtractor(num_frames, nf, name='edvr')
        feats_keyframe = {
            i: edvr(x_pad[:, i:i + num_frames]) for i in keyframe_idx
        }

        backward_trunk = ConvResidualBlocks(nf, self.num_block,
                                            name='backward_trunk')
        forward_trunk = ConvResidualBlocks(nf, self.num_block,
                                           name='forward_trunk')
        backward_fusion = nn.Conv(nf, (3, 3), padding=1,
                                  name='backward_fusion')
        forward_fusion = nn.Conv(nf, (3, 3), padding=1,
                                 name='forward_fusion')
        upconv1 = nn.Conv(nf * 4, (3, 3), padding=1, name='upconv1')
        upconv2 = nn.Conv(64 * 4, (3, 3), padding=1, name='upconv2')
        conv_hr = nn.Conv(64, (3, 3), padding=1, name='conv_hr')
        conv_last = nn.Conv(3, (3, 3), padding=1, name='conv_last')

        out_l = [None] * n
        feat_prop = jnp.zeros((b, h, w, nf), x.dtype)
        for i in range(n - 1, -1, -1):
            x_i = x[:, i]
            if i < n - 1:
                feat_prop = flow_warp(feat_prop, flows_backward[:, i])
            if i in keyframe_idx:
                feat_prop = backward_fusion(
                    jnp.concatenate([feat_prop, feats_keyframe[i]], -1))
            feat_prop = backward_trunk(
                jnp.concatenate([x_i, feat_prop], -1))
            out_l[i] = feat_prop

        feat_prop = jnp.zeros_like(feat_prop)
        outs = []
        for i in range(n):
            x_i = x[:, i]
            if i > 0:
                feat_prop = flow_warp(feat_prop, flows_forward[:, i - 1])
            if i in keyframe_idx:
                feat_prop = forward_fusion(
                    jnp.concatenate([feat_prop, feats_keyframe[i]], -1))
            feat_prop = forward_trunk(
                jnp.concatenate([x_i, out_l[i], feat_prop], -1))

            out = _lrelu(pixel_shuffle(upconv1(feat_prop), 2))
            out = _lrelu(pixel_shuffle(upconv2(out), 2))
            out = _lrelu(conv_hr(out))
            out = conv_last(out)
            base = interpolate(x_i, scale_factor=4, mode='bilinear',
                               align_corners=False)
            outs.append(out + base)
        out = jnp.stack(outs, axis=1)
        return out[:, :, :4 * h_input, :4 * w_input]
