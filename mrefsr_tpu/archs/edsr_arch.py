"""EDSR, flax/NHWC (reference basicsr/archs/edsr_arch.py:9-61)."""
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .arch_util import ResidualBlockNoBN, run_blocks, upsample_pixelshuffle


@ARCH_REGISTRY.register()
class EDSR(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    upscale: int = 4
    res_scale: float = 1.0
    img_range: float = 255.
    rgb_mean: Tuple[float, float, float] = (0.4488, 0.4371, 0.4040)

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean, x.dtype)
        x = (x - mean) * self.img_range
        x = nn.Conv(self.num_feat, (3, 3), padding=1, name='conv_first')(x)
        res = run_blocks(x, ResidualBlockNoBN, self.num_block, 'body',
                         num_feat=self.num_feat, res_scale=self.res_scale,
                         pytorch_init=True)
        res = nn.Conv(self.num_feat, (3, 3), padding=1,
                      name='conv_after_body')(res)
        res = res + x
        out = upsample_pixelshuffle(res, self.upscale, self.num_feat,
                                    prefix='upsample')
        out = nn.Conv(self.num_out_ch, (3, 3), padding=1,
                      name='conv_last')(out)
        return out / self.img_range + mean
