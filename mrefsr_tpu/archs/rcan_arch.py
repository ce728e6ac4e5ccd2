"""RCAN (residual channel attention network), flax/NHWC
(reference basicsr/archs/rcan_arch.py:1-135)."""
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .arch_util import run_blocks, upsample_pixelshuffle


class ChannelAttention(nn.Module):
    """Global-pool squeeze/excite (reference rcan_arch.py:8-24). Children
    named 'attention.1'/'attention.3' like the torch Sequential (pool and
    activations own 0/2/4)."""
    num_feat: int
    squeeze_factor: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(self.num_feat // self.squeeze_factor, (1, 1),
                    name='attention.1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.num_feat, (1, 1), name='attention.3')(y)
        return x * jax.nn.sigmoid(y)


class RCAB(nn.Module):
    """Residual channel attention block (reference rcan_arch.py:27-46)."""
    num_feat: int
    squeeze_factor: int = 16
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        res = nn.Conv(self.num_feat, (3, 3), padding=1, name='rcab.0')(x)
        res = nn.relu(res)
        res = nn.Conv(self.num_feat, (3, 3), padding=1, name='rcab.2')(res)
        res = ChannelAttention(self.num_feat, self.squeeze_factor,
                               name='rcab.3')(res)
        return res * self.res_scale + x


class ResidualGroup(nn.Module):
    """(reference rcan_arch.py:49-69)"""
    num_feat: int
    num_block: int
    squeeze_factor: int = 16
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        res = run_blocks(x, RCAB, self.num_block, 'residual_group',
                         num_feat=self.num_feat,
                         squeeze_factor=self.squeeze_factor,
                         res_scale=self.res_scale)
        res = nn.Conv(self.num_feat, (3, 3), padding=1, name='conv')(res)
        return res + x


@ARCH_REGISTRY.register()
class RCAN(nn.Module):
    """(reference rcan_arch.py:72-135)"""
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_group: int = 10
    num_block: int = 16
    squeeze_factor: int = 16
    upscale: int = 4
    res_scale: float = 1.0
    img_range: float = 255.
    rgb_mean: Tuple[float, float, float] = (0.4488, 0.4371, 0.4040)

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean, x.dtype)
        x = (x - mean) * self.img_range
        x = nn.Conv(self.num_feat, (3, 3), padding=1, name='conv_first')(x)
        res = run_blocks(x, ResidualGroup, self.num_group, 'body',
                         num_feat=self.num_feat, num_block=self.num_block,
                         squeeze_factor=self.squeeze_factor,
                         res_scale=self.res_scale)
        res = nn.Conv(self.num_feat, (3, 3), padding=1,
                      name='conv_after_body')(res)
        res = res + x
        out = upsample_pixelshuffle(res, self.upscale, self.num_feat)
        out = nn.Conv(self.num_out_ch, (3, 3), padding=1,
                      name='conv_last')(out)
        return out / self.img_range + mean
