"""DFDNet building blocks, flax/NHWC
(reference basicsr/archs/dfdnet_util.py).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .hifacegan_util import SNConv


def blur(x):
    """Fixed 3x3 binomial blur, depthwise (reference dfdnet_util.py:8-55;
    the custom autograd Function there only swaps the kernel flip in the
    backward — with a symmetric kernel jax.grad matches it for free)."""
    kernel = jnp.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]],
                         jnp.float32)
    kernel = kernel / kernel.sum()
    c = x.shape[-1]
    kern = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=c)


def calc_mean_std(feat, eps=1e-5):
    """Per-sample channel stats (reference dfdnet_util.py:57-72), NHWC."""
    mean = feat.mean(axis=(1, 2), keepdims=True)
    var = feat.var(axis=(1, 2), ddof=1, keepdims=True) + eps
    return mean, jnp.sqrt(var)


def adaptive_instance_normalization(content_feat, style_feat):
    """AdaIN: re-style reference features (reference :75-89)."""
    style_mean, style_std = calc_mean_std(style_feat)
    content_mean, content_std = calc_mean_std(content_feat)
    normalized = (content_feat - content_mean) / content_std
    return normalized * style_std + style_mean


class MSDilationBlock(nn.Module):
    """Multi-scale dilation block (reference dfdnet_util.py:122-146)."""
    in_channels: int
    kernel_size: int = 3
    dilation: tuple = (1, 1, 1, 1)

    @nn.compact
    def __call__(self, x):
        outs = []
        k = self.kernel_size
        for i in range(4):
            d = self.dilation[i]
            pad = ((k - 1) // 2) * d
            y = SNConv(self.in_channels, (k, k), padding=pad,
                       kernel_dilation=d, name=f'conv_blocks.{i}.0')(x)
            y = jax.nn.leaky_relu(y, 0.2)
            y = SNConv(self.in_channels, (k, k), padding=pad,
                       kernel_dilation=d, name=f'conv_blocks.{i}.2')(y)
            outs.append(y)
        out = jnp.concatenate(outs, axis=-1)
        out = SNConv(self.in_channels, (k, k), padding=(k - 1) // 2,
                     name='conv_fusion')(out)
        return out + x


class UpResBlock(nn.Module):
    """(reference dfdnet_util.py:149-161)"""
    in_channel: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.in_channel, (3, 3), padding=1, name='body.0')(x)
        y = jax.nn.leaky_relu(y, 0.2)
        y = nn.Conv(self.in_channel, (3, 3), padding=1, name='body.2')(y)
        return x + y
