"""RRDBNet (ESRGAN generator), flax/NHWC.

Behavioral rebuild of reference basicsr/archs/rrdbnet_arch.py:1-119:
23 residual-in-residual dense blocks, nearest-x2-upsample convs, and
pixel-unshuffle input folding for x1/x2 scales. Module names mirror the
torch attribute names for .pth import.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from mrefsr_tpu.ops import interpolate, pixel_unshuffle
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .arch_util import default_init


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


class ResidualDenseBlock(nn.Module):
    """Dense block with 0.2-scaled residual
    (reference rrdbnet_arch.py:10-39)."""
    num_feat: int = 64
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        init = default_init(0.1)
        conv = lambda n, name: nn.Conv(n, (3, 3), padding=1,  # noqa: E731
                                       kernel_init=init, name=name)
        x1 = _lrelu(conv(self.num_grow_ch, 'conv1')(x))
        x2 = _lrelu(conv(self.num_grow_ch, 'conv2')(
            jnp.concatenate((x, x1), -1)))
        x3 = _lrelu(conv(self.num_grow_ch, 'conv3')(
            jnp.concatenate((x, x1, x2), -1)))
        x4 = _lrelu(conv(self.num_grow_ch, 'conv4')(
            jnp.concatenate((x, x1, x2, x3), -1)))
        x5 = conv(self.num_feat, 'conv5')(
            jnp.concatenate((x, x1, x2, x3, x4), -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block (reference rrdbnet_arch.py:42-66)."""
    num_feat: int
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 name='rdb1')(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 name='rdb2')(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 name='rdb3')(out)
        return out * 0.2 + x


@ARCH_REGISTRY.register()
class RRDBNet(nn.Module):
    """ESRGAN generator (reference rrdbnet_arch.py:69-119). Input NHWC
    [0,1]."""
    num_in_ch: int
    num_out_ch: int
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        if self.scale == 2:
            feat = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            feat = pixel_unshuffle(x, 4)
        else:
            feat = x
        feat = nn.Conv(self.num_feat, (3, 3), padding=1,
                       name='conv_first')(feat)
        body_feat = feat
        for i in range(self.num_block):
            body_feat = RRDB(self.num_feat, self.num_grow_ch,
                             name=f'body.{i}')(body_feat)
        body_feat = nn.Conv(self.num_feat, (3, 3), padding=1,
                            name='conv_body')(body_feat)
        feat = feat + body_feat
        feat = _lrelu(nn.Conv(self.num_feat, (3, 3), padding=1,
                              name='conv_up1')(
            interpolate(feat, scale_factor=2, mode='nearest')))
        feat = _lrelu(nn.Conv(self.num_feat, (3, 3), padding=1,
                              name='conv_up2')(
            interpolate(feat, scale_factor=2, mode='nearest')))
        out = nn.Conv(self.num_out_ch, (3, 3), padding=1, name='conv_last')(
            _lrelu(nn.Conv(self.num_feat, (3, 3), padding=1,
                           name='conv_hr')(feat)))
        return out
