"""RIDNet: real image denoising with feature attention, flax/NHWC.

Rebuild of reference basicsr/archs/ridnet_arch.py (MeanShift:8,
EResidualBlockNoBN:31, MergeRun:59, ChannelAttention:92,
EAM:111, RIDNet:141). Child names mirror the torch module tree so the
generic .pth converter applies.
"""
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from mrefsr_tpu.archs.arch_util import ResidualBlockNoBN
from mrefsr_tpu.utils.registry import ARCH_REGISTRY


class MeanShift(nn.Module):
    """1x1 conv initialized to (x - sign*mean)/std per channel
    (reference ridnet_arch.py:8-29). Stored as a real conv param so
    converted checkpoints (which serialize it) load."""
    rgb_range: float
    rgb_mean: Sequence[float]
    rgb_std: Sequence[float]
    sign: int = -1

    @nn.compact
    def __call__(self, x):
        def kernel_init(key, shape=None):
            std = jnp.asarray(self.rgb_std, jnp.float32)
            return (jnp.eye(3) / std[:, None]).T.reshape(1, 1, 3, 3)

        def bias_init(key, shape=None):
            mean = jnp.asarray(self.rgb_mean, jnp.float32)
            std = jnp.asarray(self.rgb_std, jnp.float32)
            return self.sign * self.rgb_range * mean / std

        # params live on this module (torch: MeanShift IS the conv)
        kernel = self.param('kernel', kernel_init)
        bias = self.param('bias', bias_init)
        return jnp.einsum('nhwi,io->nhwo', x, kernel[0, 0]) + bias


class EResidualBlockNoBN(nn.Module):
    """Conv-ReLU-Conv-ReLU-Conv1x1 + residual, ReLU after the add
    (reference ridnet_arch.py:31-57)."""
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.out_channels, (3, 3), padding=1,
                      name='body.0')(x)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (3, 3), padding=1,
                      name='body.2')(out)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (1, 1), name='body.4')(out)
        return nn.relu(out + x)


class MergeRun(nn.Module):
    """Two dilated-conv branches concatenated then aggregated, residual
    (reference ridnet_arch.py:59-89)."""
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        d1 = nn.Conv(self.out_channels, (3, 3), padding=1,
                     name='dilation1.0')(x)
        d1 = nn.relu(d1)
        d1 = nn.Conv(self.out_channels, (3, 3), padding=2,
                     kernel_dilation=(2, 2), name='dilation1.2')(d1)
        d1 = nn.relu(d1)
        d2 = nn.Conv(self.out_channels, (3, 3), padding=3,
                     kernel_dilation=(3, 3), name='dilation2.0')(x)
        d2 = nn.relu(d2)
        d2 = nn.Conv(self.out_channels, (3, 3), padding=4,
                     kernel_dilation=(4, 4), name='dilation2.2')(d2)
        d2 = nn.relu(d2)
        out = jnp.concatenate([d1, d2], axis=-1)
        out = nn.Conv(self.out_channels, (3, 3), padding=1,
                      name='aggregation.0')(out)
        out = nn.relu(out)
        return out + x


class ChannelAttention(nn.Module):
    """Squeeze-excite channel attention (reference ridnet_arch.py:92-108)."""
    mid_channels: int
    squeeze_factor: int = 16

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.Conv(self.mid_channels // self.squeeze_factor, (1, 1),
                    name='attention.1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.mid_channels, (1, 1), name='attention.3')(y)
        return x * nn.sigmoid(y)


class EAM(nn.Module):
    """Enhancement attention module (reference ridnet_arch.py:111-138)."""
    in_channels: int
    mid_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        out = MergeRun(self.in_channels, self.mid_channels,
                       name='merge')(x)
        out = nn.relu(ResidualBlockNoBN(self.mid_channels,
                                        name='block1')(out))
        out = EResidualBlockNoBN(self.mid_channels, self.out_channels,
                                 name='block2')(out)
        return ChannelAttention(self.out_channels, name='ca')(out)


@ARCH_REGISTRY.register()
class RIDNet(nn.Module):
    """RIDNet denoiser (reference ridnet_arch.py:141-185).

    Call: NHWC image; returns denoised image (global residual).
    """
    in_channels: int
    mid_channels: int
    out_channels: int
    num_block: int = 4
    img_range: float = 255.
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)
    rgb_std: Sequence[float] = (1.0, 1.0, 1.0)

    @nn.compact
    def __call__(self, x):
        res = MeanShift(self.img_range, self.rgb_mean, self.rgb_std,
                        name='sub_mean')(x)
        res = nn.relu(nn.Conv(self.mid_channels, (3, 3), padding=1,
                              name='head')(res))
        for i in range(self.num_block):
            res = EAM(self.mid_channels, self.mid_channels,
                      self.mid_channels, name=f'body.{i}')(res)
        res = nn.Conv(self.out_channels, (3, 3), padding=1,
                      name='tail')(res)
        res = MeanShift(self.img_range, self.rgb_mean, self.rgb_std,
                        sign=1, name='add_mean')(res)
        return x + res
