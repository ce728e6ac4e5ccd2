"""Modified SRResNet (MSRResNet), flax/NHWC.

Behavioral rebuild of reference basicsr/archs/srresnet_arch.py:9-67.
"""
import flax.linen as nn
import jax

from mrefsr_tpu.ops import interpolate, pixel_shuffle
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .arch_util import ResidualBlockNoBN, default_init, run_blocks


@ARCH_REGISTRY.register()
class MSRResNet(nn.Module):
    """16 ResBlocks + pixelshuffle upsampling + bilinear global residual."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    upscale: int = 4

    @nn.compact
    def __call__(self, x):
        init = default_init(0.1)
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.1)  # noqa: E731
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), padding=1,
                             kernel_init=init, name='conv_first')(x))
        out = run_blocks(feat, ResidualBlockNoBN, self.num_block, 'body',
                         num_feat=self.num_feat)

        if self.upscale == 4:
            out = lrelu(pixel_shuffle(
                nn.Conv(self.num_feat * 4, (3, 3), padding=1,
                        kernel_init=init, name='upconv1')(out), 2))
            out = lrelu(pixel_shuffle(
                nn.Conv(self.num_feat * 4, (3, 3), padding=1,
                        kernel_init=init, name='upconv2')(out), 2))
        elif self.upscale in (2, 3):
            out = lrelu(pixel_shuffle(
                nn.Conv(self.num_feat * self.upscale**2, (3, 3), padding=1,
                        kernel_init=init, name='upconv1')(out),
                self.upscale))

        out = nn.Conv(self.num_out_ch, (3, 3), padding=1, kernel_init=init,
                      name='conv_last')(
            lrelu(nn.Conv(self.num_feat, (3, 3), padding=1,
                          kernel_init=init, name='conv_hr')(out)))
        base = interpolate(x, scale_factor=self.upscale, mode='bilinear',
                           align_corners=False)
        return out + base
