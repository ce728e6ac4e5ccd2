"""ECBSR: edge-oriented re-parameterizable SR, flax/NHWC.

Rebuild of reference basicsr/archs/ecbsr_arch.py (SeqConv3x3:8,
ECB:160, ECBSR:236). Branch params keep the reference's torch names
(k0/b0/k1/b1/scale/bias/mask) and OIHW layouts so checkpoints convert
mechanically; the forward always runs the folded form — every branch
collapsed into one dense 3x3 conv (rep_params, reference
ecbsr_arch.py:135-158,222-234) — which is mathematically identical to
the training-time multi-branch sum and is the TPU-friendly shape
(a single MXU conv per block).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mrefsr_tpu.archs.arch_util import PReLU
from mrefsr_tpu.ops import pixel_shuffle
from mrefsr_tpu.utils.registry import ARCH_REGISTRY


def _conv_oihw(x, weight, bias=None, padding=0, groups=1):
    """2-D conv taking the torch OIHW kernel layout directly."""
    out = jax.lax.conv_general_dilated(
        x, weight, window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=('NHWC', 'OIHW', 'NHWC'),
        feature_group_count=groups)
    if bias is not None:
        out = out + bias
    return out


def _edge_mask(seq_type, out_channels):
    """Fixed 3x3 edge-filter bank (reference ecbsr_arch.py:49-103)."""
    m = np.zeros((3, 3), np.float32)
    if seq_type == 'conv1x1-sobelx':
        m[:, 0] = [1, 2, 1]
        m[:, 2] = [-1, -2, -1]
    elif seq_type == 'conv1x1-sobely':
        m[0, :] = [1, 2, 1]
        m[2, :] = [-1, -2, -1]
    elif seq_type == 'conv1x1-laplacian':
        m[0, 1] = m[1, 0] = m[1, 2] = m[2, 1] = 1.0
        m[1, 1] = -4.0
    return np.broadcast_to(m, (out_channels, 1, 3, 3)).copy()


def _torch_conv_init(fan_in):
    """torch Conv2d default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    def init(key, shape):
        lim = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, jnp.float32, -lim, lim)
    return init


class SeqConv3x3(nn.Module):
    """Expand-and-squeeze / edge-filter branch
    (reference ecbsr_arch.py:8-158). Calling the module returns the
    branch folded to a dense (OIHW kernel, bias) pair — algebraically
    identical to the two-conv training forward because the reference's
    pad-with-bias trick equals running the 1x1 conv over a zero-padded
    input."""
    seq_type: str
    in_channels: int
    out_channels: int
    depth_multiplier: float = 1

    @nn.compact
    def __call__(self):
        cin, cout = self.in_channels, self.out_channels
        if self.seq_type == 'conv1x1-conv3x3':
            mid = int(cout * self.depth_multiplier)
            k0 = self.param('k0', _torch_conv_init(cin), (mid, cin, 1, 1))
            b0 = self.param('b0', _torch_conv_init(cin), (mid,))
            k1 = self.param('k1', _torch_conv_init(mid * 9),
                            (cout, mid, 3, 3))
            b1 = self.param('b1', _torch_conv_init(mid * 9), (cout,))
            rep_w = jnp.einsum('omhw,mi->oihw', k1, k0[:, :, 0, 0])
            rep_b = jnp.einsum('omhw,m->o', k1, b0) + b1
        else:
            k0 = self.param('k0', _torch_conv_init(cin), (cout, cin, 1, 1))
            b0 = self.param('b0', _torch_conv_init(cin), (cout,))
            scale = self.param(
                'scale', lambda key, s: 1e-3 * jax.random.normal(key, s),
                (cout, 1, 1, 1))
            bias = self.param(
                'bias', lambda key, s: 1e-3 * jax.random.normal(key, s),
                (cout,))
            mask = self.param(
                'mask',
                lambda key: jnp.asarray(_edge_mask(self.seq_type, cout)))
            # the Sobel/Laplacian mask is a FIXED prior: the reference
            # registers it with requires_grad=False (ecbsr_arch.py:
            # 57/79/100); kept as a param for .pth key parity but cut
            # out of the gradient so Adam never updates it
            mask = jax.lax.stop_gradient(mask)
            tmp = scale * mask  # (cout, 1, 3, 3) depthwise kernel
            rep_w = jnp.einsum('ohw,oi->oihw', tmp[:, 0], k0[:, :, 0, 0])
            rep_b = tmp[:, 0].sum(axis=(1, 2)) * b0 + bias
        return rep_w, rep_b


class _Conv3x3Params(nn.Module):
    """Plain conv params stored flax-style (HWIO 'kernel' + 'bias') so
    the torch key '<ecb>.conv3x3.weight' converts mechanically; returns
    the OIHW view for kernel folding."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        kernel = self.param('kernel', _torch_conv_init(self.cin * 9),
                            (3, 3, self.cin, self.cout))
        bias = self.param('bias', _torch_conv_init(self.cin * 9),
                          (self.cout,))
        return kernel.transpose(3, 2, 0, 1), bias


class ECB(nn.Module):
    """Edge-oriented convolution block (reference ecbsr_arch.py:160-234):
    5 parallel branches folded into one reparameterized 3x3 conv."""
    in_channels: int
    out_channels: int
    depth_multiplier: float
    act_type: str = 'prelu'
    with_idt: bool = False

    @nn.compact
    def __call__(self, x):
        cin, cout = self.in_channels, self.out_channels
        with_idt = self.with_idt and cin == cout

        w0, b0 = _Conv3x3Params(cin, cout, name='conv3x3')()
        w1, b1 = SeqConv3x3('conv1x1-conv3x3', cin, cout,
                            self.depth_multiplier, name='conv1x1_3x3')()
        w2, b2 = SeqConv3x3('conv1x1-sobelx', cin, cout,
                            name='conv1x1_sbx')()
        w3, b3 = SeqConv3x3('conv1x1-sobely', cin, cout,
                            name='conv1x1_sby')()
        w4, b4 = SeqConv3x3('conv1x1-laplacian', cin, cout,
                            name='conv1x1_lpl')()
        rep_w = w0 + w1 + w2 + w3 + w4
        rep_b = b0 + b1 + b2 + b3 + b4
        if with_idt:
            idt = jnp.zeros((cout, cout, 3, 3), rep_w.dtype)
            idt = idt.at[jnp.arange(cout), jnp.arange(cout), 1, 1].set(1.0)
            rep_w = rep_w + idt
        y = _conv_oihw(x, rep_w, rep_b, padding=1)

        if self.act_type == 'prelu':
            y = PReLU(num_parameters=cout, name='act')(y)
        elif self.act_type == 'relu':
            y = nn.relu(y)
        elif self.act_type == 'softplus':
            y = jax.nn.softplus(y)
        elif self.act_type == 'linear':
            pass
        else:
            raise ValueError(f'activation {self.act_type} not supported')
        return y


@ARCH_REGISTRY.register()
class ECBSR(nn.Module):
    """ECBSR network (reference ecbsr_arch.py:236-300).

    Call: NHWC image; returns pixel-shuffled SR output.
    """
    num_in_ch: int
    num_out_ch: int
    num_block: int
    num_channel: int
    with_idt: bool
    act_type: str
    scale: int

    @nn.compact
    def __call__(self, x):
        y = ECB(self.num_in_ch, self.num_channel, 2.0,
                act_type=self.act_type, with_idt=self.with_idt,
                name='backbone.0')(x)
        for i in range(self.num_block):
            y = ECB(self.num_channel, self.num_channel, 2.0,
                    act_type=self.act_type, with_idt=self.with_idt,
                    name=f'backbone.{i + 1}')(y)
        y = ECB(self.num_channel, self.num_out_ch * self.scale ** 2, 2.0,
                act_type='linear', with_idt=self.with_idt,
                name=f'backbone.{self.num_block + 1}')(y)
        if self.num_in_ch > 1:
            # repeat_interleave over channels (reference ecbsr_arch.py:295)
            shortcut = jnp.repeat(x, self.scale ** 2, axis=-1)
        else:
            shortcut = x
        return pixel_shuffle(y + shortcut, self.scale)
