"""SRVGGNetCompact (Real-ESRGAN compact net), flax/NHWC
(reference basicsr/archs/srvgg_arch.py:8-70)."""
import flax.linen as nn
import jax

from mrefsr_tpu.ops import interpolate, pixel_shuffle
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .arch_util import PReLU


@ARCH_REGISTRY.register()
class SRVGGNetCompact(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 16
    upscale: int = 4
    act_type: str = 'prelu'

    @nn.compact
    def __call__(self, x):
        def act(v, idx):
            if self.act_type == 'relu':
                return nn.relu(v)
            if self.act_type == 'prelu':
                return PReLU(num_parameters=self.num_feat,
                             name=f'body.{idx}')(v)
            return jax.nn.leaky_relu(v, 0.1)

        out = nn.Conv(self.num_feat, (3, 3), padding=1, name='body.0')(x)
        out = act(out, 1)
        idx = 2
        for _ in range(self.num_conv):
            out = nn.Conv(self.num_feat, (3, 3), padding=1,
                          name=f'body.{idx}')(out)
            out = act(out, idx + 1)
            idx += 2
        out = nn.Conv(self.num_out_ch * self.upscale**2, (3, 3), padding=1,
                      name=f'body.{idx}')(out)
        out = pixel_shuffle(out, self.upscale)
        base = interpolate(x, scale_factor=self.upscale, mode='nearest')
        return out + base
