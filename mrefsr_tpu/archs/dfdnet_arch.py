"""DFDNet face dictionary SR, flax/NHWC
(reference basicsr/archs/dfdnet_arch.py).

Inference-only network (the reference supports batch=1 testing only).
Part locations vary per face; the reference crops dynamic-size part
regions (dfdnet_arch.py:107-126), which would force an XLA recompile
per face. Here the whole forward is **jit-compatible with static
shapes**: part boxes are traced *values*, the crop+resize composes into
coordinate sampling at the (static) dictionary size, the swapped atom
pastes back through an inverse nearest warp + inside-box mask, and the
part-local attention convs run masked on the full map (zeroing outside
the box reproduces the crop's zero padding exactly). The facial
component dictionary is passed as arrays (see :func:`load_dfdnet_dict`)
rather than torch.load'ed inside the module.
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrefsr_tpu.ops import interpolate
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .dfdnet_util import (MSDilationBlock, UpResBlock,
                          adaptive_instance_normalization, blur)
from .hifacegan_util import SNConv
from .vgg_arch import VGGFeatureExtractor


def crop_resize_bilinear(x, box, out_size):
    """Sample the ``box`` region of NHWC ``x`` at ``out_size`` with the
    same math as ``interpolate(x[:, y0:y1, x0:x1], size=out_size,
    mode='bilinear', align_corners=False)`` — but with the box as traced
    values, so it works under jit with static output shapes.

    box = (y0, x0, y1, x1) scalars (python ints or traced int32).
    """
    y0, x0, y1, x1 = box
    bh = (y1 - y0).astype(jnp.float32) if hasattr(y1 - y0, 'astype') \
        else float(y1 - y0)
    bw = (x1 - x0).astype(jnp.float32) if hasattr(x1 - x0, 'astype') \
        else float(x1 - x0)
    dh, dw = out_size
    h, w = x.shape[1:3]

    # half-pixel source centers in crop coords, corners clamped to the
    # crop (NOT the full map) — identical to jax.image.resize on the
    # cropped tensor
    sy = (jnp.arange(dh, dtype=jnp.float32) + 0.5) * (bh / dh) - 0.5
    sx = (jnp.arange(dw, dtype=jnp.float32) + 0.5) * (bw / dw) - 0.5
    iy0 = jnp.floor(sy)
    ix0 = jnp.floor(sx)
    wy = (sy - iy0)[None, :, None, None]
    wx = (sx - ix0)[None, None, :, None]
    bh_i = jnp.int32(y1 - y0)
    bw_i = jnp.int32(x1 - x0)
    ry0 = jnp.clip(iy0.astype(jnp.int32), 0, bh_i - 1) + y0
    ry1 = jnp.clip(iy0.astype(jnp.int32) + 1, 0, bh_i - 1) + y0
    rx0 = jnp.clip(ix0.astype(jnp.int32), 0, bw_i - 1) + x0
    rx1 = jnp.clip(ix0.astype(jnp.int32) + 1, 0, bw_i - 1) + x0
    ry0 = jnp.clip(ry0, 0, h - 1)
    ry1 = jnp.clip(ry1, 0, h - 1)
    rx0 = jnp.clip(rx0, 0, w - 1)
    rx1 = jnp.clip(rx1, 0, w - 1)

    top = (jnp.take(jnp.take(x, ry0, axis=1), rx0, axis=2) * (1 - wx)
           + jnp.take(jnp.take(x, ry0, axis=1), rx1, axis=2) * wx)
    bot = (jnp.take(jnp.take(x, ry1, axis=1), rx0, axis=2) * (1 - wx)
           + jnp.take(jnp.take(x, ry1, axis=1), rx1, axis=2) * wx)
    return top * (1 - wy) + bot * wy


def paste_nearest(atom, box, full_hw):
    """Inverse nearest-warp of ``atom`` (dh, dw, c) into the ``box`` of a
    zero full-size map — equal (inside the box) to
    ``interpolate(atom[None], size=(bh, bw), mode='nearest')`` pasted at
    the box, with torch's legacy floor(dst*in/out) index rule. Returns
    (full map (1, H, W, c), inside mask (1, H, W, 1))."""
    y0, x0, y1, x1 = box
    dh, dw = atom.shape[:2]
    h, w = full_hw
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]
    inside = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))
    bh = (y1 - y0).astype(jnp.float32) if hasattr(y1 - y0, 'astype') \
        else float(y1 - y0)
    bw = (x1 - x0).astype(jnp.float32) if hasattr(x1 - x0, 'astype') \
        else float(x1 - x0)
    iy = jnp.clip(((yy - y0).astype(jnp.float32) * (dh / bh))
                  .astype(jnp.int32), 0, dh - 1)
    ix = jnp.clip(((xx - x0).astype(jnp.float32) * (dw / bw))
                  .astype(jnp.int32), 0, dw - 1)
    iy = jnp.broadcast_to(iy, (h, w))
    ix = jnp.broadcast_to(ix, (h, w))
    full = atom[iy, ix, :]  # (H, W, c)
    mask = inside[None, :, :, None]
    return full[None] * mask, mask


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
    def __call__(self, x, part_name, f_size, channels, mask=None):
        """``mask`` (inside-box, broadcastable) re-zeroes activations
        between the two convs so a masked full-map pass reproduces the
        reference's crop-local convs with zero padding at the box edge
        (the input is already zero outside the box)."""
        p = f'{part_name}_{f_size}'
        x = SNConv(channels, (3, 3), padding=1, name=f'{p}.0')(x)
        x = jax.nn.leaky_relu(x, 0.2)
        if mask is not None:
            x = x * mask
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
                location = jnp.asarray(
                    part_locations[part_idx][batch]).astype(
                        jnp.int32) // (512 // f_size)
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
        """Dictionary feature swap (reference dfdnet_arch.py:107-126),
        static-shape / jit-compatible: the box is traced data, not a
        python slice (see module docstring)."""
        x0, y0, x1, y1 = location[0], location[1], location[2], location[3]
        box = (y0, x0, y1, x1)
        dh, dw = dict_feat.shape[1:3]
        # crop + bilinear resize to the dictionary size, composed into
        # one coordinate sampling (static output shape)
        part_resize_feat = crop_resize_bilinear(vgg_feat, box, (dh, dw))
        dict_feat = adaptive_instance_normalization(dict_feat,
                                                    part_resize_feat)
        # correlation of the query patch against every dictionary atom
        sim = jnp.einsum('hwc,khwc->k', part_resize_feat[0], dict_feat)
        sim = jax.nn.softmax(sim)
        atom = jnp.take(dict_feat, jnp.argmax(sim), axis=0)
        # inverse nearest paste of the selected atom into the box
        swap_full, mask = paste_nearest(atom, box, vgg_feat.shape[1:3])
        part_full = vgg_feat * mask
        # masked full-map convs == the reference's crop-local convs with
        # zero padding at the box edge: re-mask between the two convs so
        # bias/spill outside the box never leaks back in
        diff = swap_full - part_full
        attn = attn_blocks(diff, part_name, f_size, channels, mask)
        attn_feat = attn * swap_full
        return jnp.where(mask, attn_feat + part_full, updated_feat)
