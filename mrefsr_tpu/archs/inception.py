"""FID InceptionV3 feature extractor, flax/NHWC
(reference basicsr/archs/inception.py:17-303).

Implements the TF-FID variant of Inception-v3 (modified A/C/E pooling
semantics) with torchvision-compatible parameter names so the standard
``pt_inception-2015-12-05`` FID weights import through the torch->flax
converter. Unregistered helper, like the reference.
"""
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

FID_WEIGHTS_URL = ('https://github.com/mseitzer/pytorch-fid/releases'
                   '/download/fid_weights/pt_inception-2015-12-05-6726825d.pth')


class BasicConv2d(nn.Module):
    """conv (no bias) + BN(eps=1e-3) + relu."""
    out_channels: int
    kernel_size: Sequence[int]
    strides: int = 1
    padding: Sequence = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, tuple(self.kernel_size),
                    strides=self.strides, padding=self.padding,
                    use_bias=False, name='conv')(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name='bn')(x)
        return nn.relu(x)


def _pad2(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


def _avg_pool3x3(x, count_include_pad=False):
    """3x3 stride-1 pad-1 average pool; count_include_pad=False matches
    the FID-patched branches (reference inception.py:189-240)."""
    summed = jax.lax.reduce_window(
        x, 0., jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    if count_include_pad:
        return summed / 9.
    ones = jnp.ones(x.shape[1:3])[None, :, :, None]
    counts = jax.lax.reduce_window(
        ones, 0., jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return summed / counts


def _max_pool(x, window=3, stride=2, padding=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)])


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name='branch1x1')(x)
        b5 = BasicConv2d(48, (1, 1), name='branch5x5_1')(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad2(2),
                         name='branch5x5_2')(b5)
        b3 = BasicConv2d(64, (1, 1), name='branch3x3dbl_1')(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad2(1),
                         name='branch3x3dbl_2')(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad2(1),
                         name='branch3x3dbl_3')(b3)
        bp = _avg_pool3x3(x, count_include_pad=False)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name='branch_pool')(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=2, name='branch3x3')(x)
        bd = BasicConv2d(64, (1, 1), name='branch3x3dbl_1')(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad2(1),
                         name='branch3x3dbl_2')(bd)
        bd = BasicConv2d(96, (3, 3), strides=2, name='branch3x3dbl_3')(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name='branch1x1')(x)
        b7 = BasicConv2d(c7, (1, 1), name='branch7x7_1')(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_pad2((0, 3)),
                         name='branch7x7_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad2((3, 0)),
                         name='branch7x7_3')(b7)
        bd = BasicConv2d(c7, (1, 1), name='branch7x7dbl_1')(x)
        bd = BasicConv2d(c7, (7, 1), padding=_pad2((3, 0)),
                         name='branch7x7dbl_2')(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_pad2((0, 3)),
                         name='branch7x7dbl_3')(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_pad2((3, 0)),
                         name='branch7x7dbl_4')(bd)
        bd = BasicConv2d(192, (1, 7), padding=_pad2((0, 3)),
                         name='branch7x7dbl_5')(bd)
        bp = _avg_pool3x3(x, count_include_pad=False)
        bp = BasicConv2d(192, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name='branch3x3_1')(x)
        b3 = BasicConv2d(320, (3, 3), strides=2, name='branch3x3_2')(b3)
        b7 = BasicConv2d(192, (1, 1), name='branch7x7x3_1')(x)
        b7 = BasicConv2d(192, (1, 7), padding=_pad2((0, 3)),
                         name='branch7x7x3_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad2((3, 0)),
                         name='branch7x7x3_3')(b7)
        b7 = BasicConv2d(192, (3, 3), strides=2, name='branch7x7x3_4')(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """use_max_pool selects the FIDInceptionE_2 (Mixed_7c) variant
    (reference inception.py:275-303)."""
    use_max_pool: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name='branch1x1')(x)
        b3 = BasicConv2d(384, (1, 1), name='branch3x3_1')(x)
        b3a = BasicConv2d(384, (1, 3), padding=_pad2((0, 1)),
                          name='branch3x3_2a')(b3)
        b3b = BasicConv2d(384, (3, 1), padding=_pad2((1, 0)),
                          name='branch3x3_2b')(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name='branch3x3dbl_1')(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad2(1),
                         name='branch3x3dbl_2')(bd)
        bda = BasicConv2d(384, (1, 3), padding=_pad2((0, 1)),
                          name='branch3x3dbl_3a')(bd)
        bdb = BasicConv2d(384, (3, 1), padding=_pad2((1, 0)),
                          name='branch3x3dbl_3b')(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = _max_pool(x, 3, 1, padding=1)
        else:
            bp = _avg_pool3x3(x, count_include_pad=False)
        bp = BasicConv2d(192, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """FID Inception feature extractor (reference inception.py:17-152).

    Returns the feature maps of the requested blocks, ascending:
    0 -> 64ch after maxpool1, 1 -> 192ch after maxpool2,
    2 -> 768ch pre-aux, 3 -> 2048ch final average pool.
    """
    output_blocks: Sequence[int] = (3,)
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        last = max(self.output_blocks)
        outputs = []
        if self.resize_input:
            n, _, _, c = x.shape
            x = jax.image.resize(x, (n, 299, 299, c), method='bilinear',
                                 antialias=False)
        if self.normalize_input:
            x = 2 * x - 1

        x = BasicConv2d(32, (3, 3), strides=2, name='Conv2d_1a_3x3')(x)
        x = BasicConv2d(32, (3, 3), name='Conv2d_2a_3x3')(x)
        x = BasicConv2d(64, (3, 3), padding=_pad2(1),
                        name='Conv2d_2b_3x3')(x)
        x = _max_pool(x, 3, 2)
        if 0 in self.output_blocks:
            outputs.append(x)
        if last == 0:
            return outputs

        x = BasicConv2d(80, (1, 1), name='Conv2d_3b_1x1')(x)
        x = BasicConv2d(192, (3, 3), name='Conv2d_4a_3x3')(x)
        x = _max_pool(x, 3, 2)
        if 1 in self.output_blocks:
            outputs.append(x)
        if last == 1:
            return outputs

        x = InceptionA(32, name='Mixed_5b')(x)
        x = InceptionA(64, name='Mixed_5c')(x)
        x = InceptionA(64, name='Mixed_5d')(x)
        x = InceptionB(name='Mixed_6a')(x)
        x = InceptionC(128, name='Mixed_6b')(x)
        x = InceptionC(160, name='Mixed_6c')(x)
        x = InceptionC(160, name='Mixed_6d')(x)
        x = InceptionC(192, name='Mixed_6e')(x)
        if 2 in self.output_blocks:
            outputs.append(x)
        if last == 2:
            return outputs

        x = InceptionD(name='Mixed_7a')(x)
        x = InceptionE(use_max_pool=False, name='Mixed_7b')(x)
        x = InceptionE(use_max_pool=True, name='Mixed_7c')(x)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # adaptive avg (1,1)
        outputs.append(x)
        return outputs
