"""Discriminators, flax/NHWC.

Behavioral rebuild of reference basicsr/archs/discriminator_arch.py:
ImageDiscriminator (SRNTT-style, used by the Ref models' GAN stage),
VGGStyleDiscriminator (SRGAN/ESRGAN), UNetDiscriminatorSN (Real-ESRGAN).

All three take a call-time ``train`` flag: the reference runs its
discriminators in train() mode during GAN training, so BatchNorm must
normalize by batch statistics (and update running stats when the
'batch_stats' collection is mutable) and spectral norm must run its
power iteration (when 'spectral' is mutable).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from mrefsr_tpu.ops import interpolate
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .arch_util import srntt_normal_init
from .hifacegan_util import SNConv


def _lrelu2(x):
    return jax.nn.leaky_relu(x, 0.2)


@ARCH_REGISTRY.register()
class ImageDiscriminator(nn.Module):
    """SRNTT-style conv-BN discriminator ending in a sigmoid head
    (reference discriminator_arch.py:11-45). Conv/BN children follow the
    torch Sequential indices: conv_blockN.{0,1,3,4} convs/bns."""
    in_nc: int = 3
    ndf: int = 32
    train_mode: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        init = srntt_normal_init(0.02)
        ura = not (train or self.train_mode)

        def conv_block(v, out_ch, prefix):
            v = nn.Conv(out_ch, (3, 3), padding=1, kernel_init=init,
                        name=f'{prefix}.0')(v)
            v = nn.BatchNorm(use_running_average=ura, momentum=0.9,
                             epsilon=1e-5, name=f'{prefix}.1')(v)
            v = _lrelu2(v)
            v = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding=1,
                        kernel_init=init, name=f'{prefix}.3')(v)
            v = nn.BatchNorm(use_running_average=ura, momentum=0.9,
                             epsilon=1e-5, name=f'{prefix}.4')(v)
            return _lrelu2(v)

        fea = conv_block(x, self.ndf, 'conv_block1')
        fea = conv_block(fea, self.ndf * 2, 'conv_block2')
        fea = conv_block(fea, self.ndf * 4, 'conv_block3')
        fea = conv_block(fea, self.ndf * 8, 'conv_block4')
        fea = conv_block(fea, self.ndf * 16, 'conv_block5')

        # out_block: AdaptiveAvgPool2d(1) -> 1x1 convs -> sigmoid
        out = jnp.mean(fea, axis=(1, 2), keepdims=True)
        out = nn.Conv(1024, (1, 1), kernel_init=init,
                      name='out_block.1')(out)
        out = _lrelu2(out)
        out = nn.Conv(1, (1, 1), kernel_init=init, name='out_block.3')(out)
        return jax.nn.sigmoid(out)


@ARCH_REGISTRY.register()
class VGGStyleDiscriminator(nn.Module):
    """VGG-style discriminator for 160/256 inputs
    (reference discriminator_arch.py:48-126)."""
    num_in_ch: int = 3
    num_feat: int = 64
    input_size: int = 160
    train_mode: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        assert x.shape[1] == self.input_size, (
            f'input size must be {self.input_size}, got {x.shape}')
        ura = not (train or self.train_mode)

        def cbl(v, out_ch, idx, sub, stride, use_bias=False, with_bn=True):
            v = nn.Conv(out_ch, (4, 4) if stride == 2 else (3, 3),
                        strides=(stride, stride), padding=1,
                        use_bias=use_bias, name=f'conv{idx}_{sub}')(v)
            if with_bn:
                v = nn.BatchNorm(use_running_average=ura, momentum=0.9,
                                 epsilon=1e-5, name=f'bn{idx}_{sub}')(v)
            return _lrelu2(v)

        feat = cbl(x, self.num_feat, 0, 0, 1, use_bias=True, with_bn=False)
        feat = cbl(feat, self.num_feat, 0, 1, 2)
        nf = self.num_feat
        for idx, ch in enumerate([nf * 2, nf * 4, nf * 8, nf * 8], start=1):
            feat = cbl(feat, ch, idx, 0, 1)
            feat = cbl(feat, ch, idx, 1, 2)
        if self.input_size == 256:
            feat = cbl(feat, nf * 8, 5, 0, 1)
            feat = cbl(feat, nf * 8, 5, 1, 2)

        # NHWC flatten differs from torch's NCHW flatten; the converter
        # permutes linear1 weights accordingly (convert.py rename hook).
        feat = feat.reshape(feat.shape[0], -1)
        feat = _lrelu2(nn.Dense(100, name='linear1')(feat))
        return nn.Dense(1, name='linear2')(feat)


@ARCH_REGISTRY.register()
class UNetDiscriminatorSN(nn.Module):
    """U-Net discriminator with spectral norm
    (reference discriminator_arch.py:128-186: conv1..conv8 are wrapped
    in torch spectral_norm; conv0/conv9 are plain).

    SNConv keeps u/v in the 'spectral' collection: marking it mutable
    runs one torch-order power iteration per forward (train behavior);
    otherwise the stored vectors are used (eval). Reference .pth files
    import directly (weight_orig -> kernel, weight_u/v -> spectral).
    """
    num_in_ch: int = 3
    num_feat: int = 64
    skip_connection: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        del train  # SN is driven by the 'spectral' collection mutability
        nf = self.num_feat
        x0 = _lrelu2(nn.Conv(nf, (3, 3), padding=1, name='conv0')(x))
        x1 = _lrelu2(SNConv(nf * 2, (4, 4), strides=2, padding=1,
                            use_bias=False, name='conv1')(x0))
        x2 = _lrelu2(SNConv(nf * 4, (4, 4), strides=2, padding=1,
                            use_bias=False, name='conv2')(x1))
        x3 = _lrelu2(SNConv(nf * 8, (4, 4), strides=2, padding=1,
                            use_bias=False, name='conv3')(x2))

        x3 = interpolate(x3, scale_factor=2, mode='bilinear',
                         align_corners=False)
        x4 = _lrelu2(SNConv(nf * 4, (3, 3), padding=1, use_bias=False,
                            name='conv4')(x3))
        if self.skip_connection:
            x4 = x4 + x2
        x4 = interpolate(x4, scale_factor=2, mode='bilinear',
                         align_corners=False)
        x5 = _lrelu2(SNConv(nf * 2, (3, 3), padding=1, use_bias=False,
                            name='conv5')(x4))
        if self.skip_connection:
            x5 = x5 + x1
        x5 = interpolate(x5, scale_factor=2, mode='bilinear',
                         align_corners=False)
        x6 = _lrelu2(SNConv(nf, (3, 3), padding=1, use_bias=False,
                            name='conv6')(x5))
        if self.skip_connection:
            x6 = x6 + x0

        out = _lrelu2(SNConv(nf, (3, 3), padding=1, use_bias=False,
                             name='conv7')(x6))
        out = _lrelu2(SNConv(nf, (3, 3), padding=1, use_bias=False,
                             name='conv8')(out))
        return nn.Conv(1, (3, 3), padding=1, name='conv9')(out)
