"""BasicVSR++ (second-order grid propagation + flow-guided deformable
alignment), flax/NHWC (reference basicsr/archs/basicvsrpp_arch.py:15-396).

TPU notes: the reference's cpu_cache offloading (``:86-100``) is a CUDA
memory workaround and is dropped — HBM + XLA rematerialization cover the
same sizes. The alignment DCN rides the shared gather+einsum
modulated_deform_conv2d op. Mirror-extension detection is a host-side
flag (``is_mirror_extended``) instead of the reference's data-dependent
norm check (:112-123), which would force a host sync under jit.
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrefsr_tpu.ops import (flow_warp, interpolate, modulated_deform_conv2d,
                            pixel_shuffle)
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .basicvsr_arch import ConvResidualBlocks
from .spynet_arch import SpyNet


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


class SecondOrderDeformableAlignment(nn.Module):
    """Flow-guided second-order deformable alignment
    (reference basicvsrpp_arch.py:338-396). Params mirror
    ModulatedDeformConvPack: kernel/bias + conv_offset.{0,2,4,6}."""
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    padding: int = 1
    deformable_groups: int = 16
    max_residue_magnitude: float = 10.

    @nn.compact
    def __call__(self, x, extra_feat, flow_1, flow_2):
        k = self.kernel_size
        dg = self.deformable_groups
        oc = self.out_channels

        feat = jnp.concatenate([extra_feat, flow_1, flow_2], axis=-1)
        feat = _lrelu(nn.Conv(oc, (3, 3), padding=1,
                              name='conv_offset.0')(feat))
        feat = _lrelu(nn.Conv(oc, (3, 3), padding=1,
                              name='conv_offset.2')(feat))
        feat = _lrelu(nn.Conv(oc, (3, 3), padding=1,
                              name='conv_offset.4')(feat))
        out = nn.Conv(27 * dg, (3, 3), padding=1,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name='conv_offset.6')(feat)

        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offset = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([o1, o2], axis=-1))  # (.., 18*dg)
        offset_1, offset_2 = jnp.split(offset, 2, axis=-1)
        # flows are (dx, dy); the offset channels are (dy, dx) per tap —
        # flip then tile per (group, tap) (reference :385-389)
        flow_1_yx = flow_1[..., ::-1]
        flow_2_yx = flow_2[..., ::-1]
        reps = offset_1.shape[-1] // 2
        offset_1 = offset_1 + jnp.tile(flow_1_yx, (1, 1, 1, reps))
        offset_2 = offset_2 + jnp.tile(flow_2_yx, (1, 1, 1, reps))
        offset = jnp.concatenate([offset_1, offset_2], axis=-1)

        n, h, w, _ = offset.shape
        offset = offset.reshape(n, h, w, dg, k * k, 2)
        mask = jax.nn.sigmoid(mask.reshape(n, h, w, dg, k * k))

        weight = self.param(
            'kernel',
            nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform'),
            (k, k, self.in_channels, oc))
        bias = self.param('bias', nn.initializers.zeros, (oc,))
        return modulated_deform_conv2d(
            x, offset, mask, weight, bias, stride=1, padding=self.padding,
            dilation=1, groups=1, deform_groups=dg)


@ARCH_REGISTRY.register()
class BasicVSRPlusPlus(nn.Module):
    """BasicVSR++ (reference basicvsrpp_arch.py:15-335). Input
    (b, t, h, w, 3); output x4 (or same size when is_low_res_input is
    False)."""
    mid_channels: int = 64
    num_blocks: int = 7
    max_residue_magnitude: float = 10.
    is_low_res_input: bool = True
    spynet_path: Any = None
    cpu_cache_length: int = 100  # accepted for config parity; unused

    @nn.compact
    def __call__(self, lqs, is_mirror_extended=False):
        b, t, h, w, c = lqs.shape
        mid = self.mid_channels
        spynet = SpyNet(name='spynet')

        if self.is_low_res_input:
            lqs_downsample = lqs
        else:
            flat = lqs.reshape(-1, h, w, c)
            flat = interpolate(flat, scale_factor=0.25, mode='bicubic')
            lqs_downsample = flat.reshape(b, t, h // 4, w // 4, c)

        # spatial features
        if self.is_low_res_input:
            feat_extract = ConvResidualBlocks(mid, 5, name='feat_extract')
            feats_spatial = feat_extract(lqs.reshape(-1, h, w, c))
        else:
            x = lqs.reshape(-1, h, w, c)
            x = _lrelu(nn.Conv(mid, (3, 3), strides=2, padding=1,
                               name='feat_extract.0')(x))
            x = _lrelu(nn.Conv(mid, (3, 3), strides=2, padding=1,
                               name='feat_extract.2')(x))
            feats_spatial = ConvResidualBlocks(
                mid, 5, name='feat_extract.4')(x)
        fh, fw = feats_spatial.shape[1:3]
        feats_spatial = feats_spatial.reshape(b, t, fh, fw, mid)
        feats = {'spatial': [feats_spatial[:, i] for i in range(t)]}

        # flows on the low-res frames (reference :127-154)
        dh, dw = lqs_downsample.shape[2:4]
        assert dh >= 64 and dw >= 64, (
            'The height and width of low-res inputs must be at least 64, '
            f'but got {dh} and {dw}.')
        lqs_1 = lqs_downsample[:, :-1].reshape(-1, dh, dw, c)
        lqs_2 = lqs_downsample[:, 1:].reshape(-1, dh, dw, c)
        flows_backward = spynet(lqs_1, lqs_2).reshape(b, t - 1, dh, dw, 2)
        if is_mirror_extended:
            flows_forward = flows_backward[:, ::-1]
        else:
            flows_forward = spynet(lqs_2, lqs_1).reshape(b, t - 1, dh, dw,
                                                         2)

        # grid propagation: 2 x (backward, forward) (reference :314-330)
        for iter_ in (1, 2):
            for direction in ('backward', 'forward'):
                module = f'{direction}_{iter_}'
                align = SecondOrderDeformableAlignment(
                    2 * mid, mid, 3, padding=1, deformable_groups=16,
                    max_residue_magnitude=self.max_residue_magnitude,
                    name=f'deform_align.{module}')
                backbone = ConvResidualBlocks(
                    mid, self.num_blocks, name=f'backbone.{module}')
                flows = flows_backward if direction == 'backward' \
                    else flows_forward
                feats = self._propagate(feats, flows, module, align,
                                        backbone, mid)

        # upsample (reference :232-272)
        reconstruction = ConvResidualBlocks(mid, 5, name='reconstruction')
        upconv1 = nn.Conv(mid * 4, (3, 3), padding=1, name='upconv1')
        upconv2 = nn.Conv(64 * 4, (3, 3), padding=1, name='upconv2')
        conv_hr = nn.Conv(64, (3, 3), padding=1, name='conv_hr')
        conv_last = nn.Conv(3, (3, 3), padding=1, name='conv_last')

        outputs = []
        num_outputs = len(feats['spatial'])
        mapping_idx = list(range(num_outputs)) + \
            list(range(num_outputs))[::-1]
        branch_feats = {k: list(v) for k, v in feats.items()
                        if k != 'spatial'}
        for i in range(t):
            hr = [branch_feats[k].pop(0) for k in branch_feats]
            hr.insert(0, feats['spatial'][mapping_idx[i]])
            hr = jnp.concatenate(hr, axis=-1)
            hr = reconstruction(hr)
            hr = _lrelu(pixel_shuffle(upconv1(hr), 2))
            hr = _lrelu(pixel_shuffle(upconv2(hr), 2))
            hr = _lrelu(conv_hr(hr))
            hr = conv_last(hr)
            if self.is_low_res_input:
                hr = hr + interpolate(lqs[:, i], scale_factor=4,
                                      mode='bilinear',
                                      align_corners=False)
            else:
                hr = hr + lqs[:, i]
            outputs.append(hr)
        return jnp.stack(outputs, axis=1)

    def _propagate(self, feats, flows, module_name, align, backbone, mid):
        """Second-order propagation along one branch
        (reference :156-230)."""
        n, t_minus_1 = flows.shape[0], flows.shape[1]
        t = t_minus_1 + 1
        fh, fw = flows.shape[2:4]

        frame_idx = list(range(t))
        flow_idx = list(range(-1, t - 1))
        mapping_idx = list(range(len(feats['spatial'])))
        mapping_idx += mapping_idx[::-1]
        if 'backward' in module_name:
            frame_idx = frame_idx[::-1]
            flow_idx = frame_idx

        feats[module_name] = []
        feat_prop = jnp.zeros((n, fh, fw, mid), flows.dtype)
        for i, idx in enumerate(frame_idx):
            feat_current = feats['spatial'][mapping_idx[idx]]
            if i > 0:
                flow_n1 = flows[:, flow_idx[i]]
                cond_n1 = flow_warp(feat_prop, flow_n1)

                feat_n2 = jnp.zeros_like(feat_prop)
                flow_n2 = jnp.zeros_like(flow_n1)
                cond_n2 = jnp.zeros_like(cond_n1)
                if i > 1:
                    feat_n2 = feats[module_name][-2]
                    flow_n2 = flows[:, flow_idx[i - 1]]
                    flow_n2 = flow_n1 + flow_warp(flow_n2, flow_n1)
                    cond_n2 = flow_warp(feat_n2, flow_n2)

                cond = jnp.concatenate([cond_n1, feat_current, cond_n2],
                                       axis=-1)
                feat_prop = jnp.concatenate([feat_prop, feat_n2], axis=-1)
                feat_prop = align(feat_prop, cond, flow_n1, flow_n2)

            feat = [feat_current] + [
                feats[k][idx] for k in feats
                if k not in ('spatial', module_name)] + [feat_prop]
            feat = jnp.concatenate(feat, axis=-1)
            feat_prop = feat_prop + backbone(feat)
            feats[module_name].append(feat_prop)

        if 'backward' in module_name:
            feats[module_name] = feats[module_name][::-1]
        return feats
