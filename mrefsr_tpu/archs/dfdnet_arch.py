"""DFDNet face dictionary SR, flax/NHWC
(reference basicsr/archs/dfdnet_arch.py).

Inference-only network (the reference supports batch=1 testing only).
Part locations vary per face, so the forward runs eagerly (op-by-op on
device) instead of under one jit — the conv trunks still execute as
compiled XLA ops. The facial component dictionary is passed as arrays
(see :func:`load_dfdnet_dict`) rather than torch.load'ed inside the
module.
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mrefsr_tpu.ops import interpolate
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .dfdnet_util import (MSDilationBlock, UpResBlock,
                          adaptive_instance_normalization, blur)
from .hifacegan_util import SNConv
from .vgg_arch import VGGFeatureExtractor


def load_dfdnet_dict(dict_path):
    """torch.load the facial component dictionary and convert to NHWC
    jnp arrays: {'256': {'left_eye': (K, h, w, c), ...}, ...}."""
    import torch
    raw = torch.load(dict_path, map_location='cpu')
    out = {}
    for k, v in raw.items():
        out[k] = {kk: jnp.asarray(vv.numpy().transpose(0, 2, 3, 1))
                  for kk, vv in v.items()}
    return out


class _AttnBlocks(nn.Module):
    """All 16 (part, scale) attention blocks under the torch ModuleDict
    scope 'attn_blocks' (reference dfdnet_arch.py:88-92)."""

    @nn.compact
    def __call__(self, x, part_name, f_size, channels):
        p = f'{part_name}_{f_size}'
        x = SNConv(channels, (3, 3), padding=1, name=f'{p}.0')(x)
        x = jax.nn.leaky_relu(x, 0.2)
        return SNConv(channels, (3, 3), padding=1, name=f'{p}.2')(x)


class SFTUpBlock(nn.Module):
    """SFT + upsample block (reference dfdnet_arch.py:12-54)."""
    in_channel: int
    out_channel: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x, updated_feat):
        out = blur(x)
        out = SNConv(self.out_channel,
                     (self.kernel_size, self.kernel_size),
                     padding=self.padding, name='conv1.1')(out)
        out = jax.nn.leaky_relu(out, 0.04)

        scale = SNConv(self.out_channel, (3, 3), padding=1,
                       name='scale_block.0')(updated_feat)
        scale = jax.nn.leaky_relu(scale, 0.2)
        scale = SNConv(self.out_channel, (3, 3), padding=1,
                       name='scale_block.2')(scale)
        shift = SNConv(self.out_channel, (3, 3), padding=1,
                       name='shift_block.0')(updated_feat)
        shift = jax.nn.leaky_relu(shift, 0.2)
        shift = SNConv(self.out_channel, (3, 3), padding=1,
                       name='shift_block.2')(shift)
        shift = jax.nn.sigmoid(shift)
        out = out * scale + shift

        out = interpolate(out, scale_factor=2, mode='bilinear',
                          align_corners=False)
        out = SNConv(self.out_channel,
                     (self.kernel_size, self.kernel_size),
                     padding=self.padding, name='convup.1')(out)
        return jax.nn.leaky_relu(out, 0.2)


@ARCH_REGISTRY.register()
class DFDNet(nn.Module):
    """DFDNet (reference dfdnet_arch.py:57-169). Call with NHWC 512x512
    faces, per-part locations (list of 4 (b,4) int arrays, xyxy in
    512-space), and the loaded dictionary."""
    num_feat: int
    dict_path: Any = None  # config parity; dict passed to __call__

    parts = ('left_eye', 'right_eye', 'nose', 'mouth')
    feature_sizes = (256, 128, 64, 32)
    channel_sizes = (128, 256, 512, 512)
    vgg_layers = ('relu2_2', 'relu3_4', 'relu4_4', 'conv5_4')

    @nn.compact
    def __call__(self, x, part_locations, face_dict):
        vgg_features = VGGFeatureExtractor(
            layer_name_list=list(self.vgg_layers), vgg_type='vgg19',
            use_input_norm=True, range_norm=True,
            name='vgg_extractor')(x)

        attn_blocks = _AttnBlocks(name='attn_blocks')
        updated_vgg_features = []
        batch = 0  # reference supports batch-1 testing only (:137)
        for layer_idx, (vgg_layer, f_size) in enumerate(
                zip(self.vgg_layers, self.feature_sizes)):
            dict_features = face_dict[f'{f_size}']
            vgg_feat = vgg_features[vgg_layer]
            updated_feat = vgg_feat
            for part_idx, part_name in enumerate(self.parts):
                location = np.asarray(
                    part_locations[part_idx][batch]) // (512 // f_size)
                location = location.astype(int)
                updated_feat = self._swap_feat(
                    attn_blocks, vgg_feat, updated_feat,
                    dict_features[part_name], location, part_name,
                    f_size, self.channel_sizes[layer_idx])
            updated_vgg_features.append(updated_feat)

        feat = MSDilationBlock(self.num_feat * 8, dilation=(4, 3, 2, 1),
                               name='multi_scale_dilation')(
                                   vgg_features['conv5_4'])
        feat = SFTUpBlock(self.num_feat * 8, self.num_feat * 8,
                          name='upsample0')(feat, updated_vgg_features[3])
        feat = SFTUpBlock(self.num_feat * 8, self.num_feat * 4,
                          name='upsample1')(feat, updated_vgg_features[2])
        feat = SFTUpBlock(self.num_feat * 4, self.num_feat * 2,
                          name='upsample2')(feat, updated_vgg_features[1])
        feat = SFTUpBlock(self.num_feat * 2, self.num_feat,
                          name='upsample3')(feat, updated_vgg_features[0])

        out = SNConv(self.num_feat, (3, 3), padding=1,
                     name='upsample4.0')(feat)
        out = jax.nn.leaky_relu(out, 0.2)
        out = UpResBlock(self.num_feat, name='upsample4.2')(out)
        out = UpResBlock(self.num_feat, name='upsample4.3')(out)
        out = nn.Conv(3, (3, 3), padding=1, name='upsample4.4')(out)
        return jnp.tanh(out)

    def _swap_feat(self, attn_blocks, vgg_feat, updated_feat, dict_feat,
                   location, part_name, f_size, channels):
        """Dictionary feature swap (reference dfdnet_arch.py:107-126)."""
        x0, y0, x1, y1 = (int(location[0]), int(location[1]),
                          int(location[2]), int(location[3]))
        part_feat = vgg_feat[:, y0:y1, x0:x1, :]
        dh, dw = dict_feat.shape[1:3]
        part_resize_feat = interpolate(part_feat, size=(dh, dw),
                                       mode='bilinear',
                                       align_corners=False)
        dict_feat = adaptive_instance_normalization(dict_feat,
                                                    part_resize_feat)
        # correlation of the query patch against every dictionary atom
        sim = jnp.einsum('hwc,khwc->k', part_resize_feat[0], dict_feat)
        sim = jax.nn.softmax(sim)
        select_idx = int(jnp.argmax(sim))
        swap = interpolate(dict_feat[select_idx:select_idx + 1],
                           size=part_feat.shape[1:3], mode='nearest')
        attn = attn_blocks(swap - part_feat, part_name, f_size, channels)
        attn_feat = attn * swap
        return updated_feat.at[:, y0:y1, x0:x1, :].set(
            attn_feat + part_feat)
