"""HiFaceGAN generator + multiscale discriminator, flax/NHWC
(reference basicsr/archs/hifacegan_arch.py).
"""
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .hifacegan_util import (InstanceNorm2d, LIPEncoder, SNConv, SPADE,
                             SPADEResnetBlock)


def _up2(x):
    """nn.Upsample(scale_factor=2) default = nearest."""
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _nearest_resize(x, size):
    n, h, w, c = x.shape
    sy = jnp.clip((jnp.arange(size[0]) * (h / size[0])).astype(jnp.int32),
                  0, h - 1)
    sx = jnp.clip((jnp.arange(size[1]) * (w / size[1])).astype(jnp.int32),
                  0, w - 1)
    return x[:, sy][:, :, sx]


@ARCH_REGISTRY.register()
class SPADEGenerator(nn.Module):
    """SPADE generator (reference hifacegan_arch.py:10-143)."""
    num_in_ch: int = 3
    num_feat: int = 64
    use_vae: bool = False
    z_dim: int = 256
    crop_size: int = 512
    norm_g: str = 'spectralspadesyncbatch3x3'
    is_train: bool = True
    init_train_phase: int = 3

    scale_ratio = 5

    @property
    def sw(self):
        return self.crop_size // (2**self.scale_ratio)

    def encode(self, x):
        """Default encoder: nearest downsample + conv
        (reference :62-70)."""
        h, w = x.shape[1:3]
        x = _nearest_resize(x, (h // 2**self.scale_ratio,
                                w // 2**self.scale_ratio))
        return nn.Conv(16 * self.num_feat, (3, 3), padding=1,
                       name='fc')(x)

    @nn.compact
    def __call__(self, x):
        seg = x
        nf = self.num_feat
        x = self.encode(x)
        x = SPADEResnetBlock(16 * nf, 16 * nf, self.norm_g,
                             name='head_0')(x, seg)
        x = _up2(x)
        x = SPADEResnetBlock(16 * nf, 16 * nf, self.norm_g,
                             name='g_middle_0')(x, seg)
        x = SPADEResnetBlock(16 * nf, 16 * nf, self.norm_g,
                             name='g_middle_1')(x, seg)

        up_channels = [(16 * nf, 8 * nf), (8 * nf, 4 * nf),
                       (4 * nf, 2 * nf), (2 * nf, nf)]
        phase = self.init_train_phase + 1 if self.is_train else 4
        for i in range(phase):
            x = _up2(x)
            x = SPADEResnetBlock(*up_channels[i], self.norm_g,
                                 name=f'ups.{i}')(x, seg)
        x = nn.Conv(3, (3, 3), padding=1,
                    name=f'to_rgbs.{phase - 1}')(
                        jax.nn.leaky_relu(x, 0.2))
        return jnp.tanh(x)


@ARCH_REGISTRY.register()
class HiFaceGAN(SPADEGenerator):
    """SPADE generator with a LIP encoder
    (reference hifacegan_arch.py:145-165)."""

    def encode(self, x):
        return LIPEncoder(self.num_in_ch, self.num_feat, self.sw, self.sw,
                          self.scale_ratio, name='lip_encoder')(x)


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (reference hifacegan_arch.py:222-259).
    Returns intermediate features when keep_features."""
    input_nc: int
    n_layers_d: int
    num_feat: int
    norm_d: str
    keep_features: bool

    @nn.compact
    def __call__(self, x):
        kw, padw = 4, 2
        nf = self.num_feat
        spectral = self.norm_d.startswith('spectral')
        # only the norm_layer-wrapped middle convs are spectral-normed
        # (reference get_nonspade_norm_layer at hifacegan_util.py:217-257;
        # first/last convs in NLayerDiscriminator stay plain)
        conv_cls = SNConv if spectral else \
            (lambda f, k, **kws: nn.Conv(f, k, **kws))

        results = [x]
        out = nn.Conv(nf, (kw, kw), strides=2, padding=padw,
                      name='model0.0')(results[-1])
        results.append(jax.nn.leaky_relu(out, 0.2))
        for n in range(1, self.n_layers_d):
            nf_prev, nf = nf, min(nf * 2, 512)
            stride = 1 if n == self.n_layers_d - 1 else 2
            out = conv_cls(nf, (kw, kw), strides=stride, padding=padw,
                           use_bias=False, name=f'model{n}.0.0')(
                               results[-1])
            out = InstanceNorm2d(affine=False)(out)
            results.append(jax.nn.leaky_relu(out, 0.2))
        out = nn.Conv(1, (kw, kw), strides=1, padding=padw,
                      name=f'model{self.n_layers_d}.0')(results[-1])
        results.append(out)
        if self.keep_features:
            return results[1:]
        return results[-1]


@ARCH_REGISTRY.register()
class HiFaceGANDiscriminator(nn.Module):
    """pix2pixHD-style multiscale discriminator
    (reference hifacegan_arch.py:168-219). Input is the channel concat
    (lq, output-or-gt) when conditional."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    conditional_d: bool = True
    num_d: int = 2
    n_layers_d: int = 4
    num_feat: int = 64
    norm_d: str = 'spectralinstance'
    keep_features: bool = True

    @nn.compact
    def __call__(self, x):
        input_nc = self.num_in_ch
        if self.conditional_d:
            input_nc += self.num_out_ch
        result = []
        for i in range(self.num_d):
            out = NLayerDiscriminator(
                input_nc, self.n_layers_d, self.num_feat, self.norm_d,
                self.keep_features, name=f'discriminator_{i}')(x)
            result.append(out)
            # 3x3 stride-2 avg pool, count_include_pad=False
            summed = jax.lax.reduce_window(
                x, 0., jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                [(0, 0), (1, 1), (1, 1), (0, 0)])
            ones = jnp.ones(x.shape[1:3])[None, :, :, None]
            counts = jax.lax.reduce_window(
                ones, 0., jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                [(0, 0), (1, 1), (1, 1), (0, 0)])
            x = summed / counts
        return result
