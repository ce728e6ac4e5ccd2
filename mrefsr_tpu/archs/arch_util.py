"""Shared arch building blocks (flax / NHWC).

Rebuild of reference basicsr/archs/arch_util.py. Module attribute names
mirror the reference's torch module names so the generic torch->flax
checkpoint converter (mrefsr_tpu/convert.py) maps state dicts by name.
"""
import math
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrefsr_tpu.ops import pixel_shuffle


def default_init(scale=1.0):
    """Kaiming-normal (fan_in, gain sqrt(2)) scaled by ``scale`` — matches
    reference default_init_weights (arch_util.py:43-72) where weights are
    kaiming-initialized then multiplied by ``scale``."""
    return nn.initializers.variance_scaling(2.0 * scale * scale, 'fan_in',
                                            'normal')


def srntt_normal_init(std=0.02):
    """N(0, std) init used by srntt_init_weights (arch_util.py:18-40)."""
    return nn.initializers.normal(stddev=std)


class PReLU(nn.Module):
    """Channel-shared PReLU matching torch nn.PReLU(num_parameters=1)."""
    num_parameters: int = 1
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            'weight', lambda key: jnp.full((self.num_parameters,),
                                           self.init, jnp.float32))
        a = alpha if self.num_parameters == 1 else alpha.reshape(
            (1,) * (x.ndim - 1) + (-1,))
        return jnp.where(x >= 0, x, a * x)


def lrelu(x, slope=0.1):
    return jax.nn.leaky_relu(x, slope)


class ResidualBlockNoBN(nn.Module):
    """Conv-ReLU-Conv residual block (reference arch_util.py:89-117).

    Weights kaiming-init scaled 0.1 like the reference unless
    pytorch_init; kernel_init overrides both (the MRefSR nets re-init
    every conv to N(0, 0.02) via srntt_init_weights).
    """
    num_feat: int = 64
    res_scale: float = 1.0
    pytorch_init: bool = False
    kernel_init: object = None

    @nn.compact
    def __call__(self, x):
        # pytorch_init=True means torch Conv2d's default
        # kaiming_uniform(a=sqrt(5)) = variance 1/(3*fan_in) — NOT
        # lecun (1/fan_in); matches DCNv2Pack's encoding below
        if self.kernel_init is not None:
            init = self.kernel_init
        else:
            init = (nn.initializers.variance_scaling(1 / 3, 'fan_in',
                                                     'uniform')
                    if self.pytorch_init else default_init(0.1))
        identity = x
        out = nn.Conv(self.num_feat, (3, 3), padding=1, kernel_init=init,
                      name='conv1')(x)
        out = nn.relu(out)
        out = nn.Conv(self.num_feat, (3, 3), padding=1, kernel_init=init,
                      name='conv2')(out)
        return identity + out * self.res_scale


class DCNv2Pack(nn.Module):
    """Modulated deformable conv whose offsets/masks come from a separate
    feature tensor (reference arch_util.py:291-318 / basicsr ops
    ModulatedDeformConvPack). Params: conv_offset child + kernel/bias.

    Call: (x, feat) with both NHWC.
    """
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 8

    @nn.compact
    def __call__(self, x, feat):
        from mrefsr_tpu.ops import (modulated_deform_conv2d,
                                    offset_mask_from_conv_out)
        k = self.kernel_size
        dg = self.deformable_groups
        out = nn.Conv(dg * 3 * k * k, (k, k),
                      strides=(self.stride, self.stride),
                      padding=self.padding,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name='conv_offset')(feat)
        offset, mask = offset_mask_from_conv_out(out, dg, (k, k))
        mask = jax.nn.sigmoid(mask)
        # training-health warning when offsets explode (reference
        # arch_util.py:308-311); debug.print is jit-safe and async
        import os as _os
        if _os.environ.get('MREFSR_DEBUG_OFFSETS'):
            # opt-in: jax.debug.print needs host callbacks, which some
            # TPU runtimes (e.g. the axon tunnel) do not support
            offset_absmean = jnp.abs(offset).mean()
            jax.lax.cond(
                offset_absmean > 50,
                lambda m: jax.debug.print(
                    'Offset abs mean is {m}, larger than 50.', m=m),
                lambda m: None, offset_absmean)
        weight = self.param(
            'kernel',
            nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform'),
            (k, k, self.in_channels // self.groups, self.out_channels))
        bias = self.param('bias', nn.initializers.zeros,
                          (self.out_channels,))
        return modulated_deform_conv2d(
            x, offset, mask, weight, bias, stride=self.stride,
            padding=self.padding, dilation=self.dilation,
            groups=self.groups, deform_groups=dg)


class RefAwareBlock(nn.Module):
    """Conditional-conv mixture-of-experts block (reference
    arch_util.py:142-197): a per-sample sigmoid routing over
    ``num_experts`` 3x3 conv kernels, computed from the spatial mean of
    the concatenated (input, ref) features, applies the combined kernel
    per sample, and gates the result with an SE branch on the same
    pooled vector. (Unused by any registered reference arch; kept for
    inventory parity.)

    TPU layout: experts live as ``expert_kernel`` (E, kh, kw, c_in,
    c_out) + ``expert_bias`` (E, c_out) so the routing mix is one einsum
    feeding a batched HWIO conv; use :meth:`variables_from_torch` to
    import the reference's 5-D OIHW-style ``weight``/``bias``.
    """
    out_channels: int = 3
    nf: int = 64
    ref_nf: int = 256
    num_experts: int = 4

    @nn.compact
    def __call__(self, x, ref, original_size=None):
        x = jnp.concatenate([x, ref], axis=-1)
        b, h, w, c = x.shape
        if original_size is None:
            x_m = x.mean(axis=(1, 2))
        else:
            x_m = x[:, :original_size[0], :original_size[1], :].mean(
                axis=(1, 2))
        routing = jax.nn.sigmoid(
            nn.Dense(self.num_experts, name='routing_func.0')(x_m))
        k = 3
        experts = self.param(
            'expert_kernel', srntt_normal_init(0.02),
            (self.num_experts, k, k, c, self.out_channels))
        expert_bias = self.param('expert_bias', nn.initializers.zeros,
                                 (self.num_experts, self.out_channels))
        kernel = jnp.einsum('be,ehwio->bhwio', routing, experts)
        bias = routing @ expert_bias

        def conv_one(xi, ki):
            return jax.lax.conv_general_dilated(
                xi[None], ki, window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0]

        out = jax.vmap(conv_one)(x, kernel) + bias[:, None, None, :]

        se = nn.Conv(c, (1, 1), name='se.0')(x_m[:, None, None, :])
        se = nn.relu(se)
        se = jax.nn.sigmoid(
            nn.Conv(self.out_channels, (1, 1), name='se.2')(se))
        return out * se

    @staticmethod
    def variables_from_torch(state_dict):
        """Map the reference module's state dict (keys ``weight``,
        ``bias``, ``routing_func.0.*``, ``se.{0,2}.*``) to this module's
        variables."""
        import numpy as np
        sd = {k: np.asarray(v) for k, v in state_dict.items()}
        return {'params': {
            'expert_kernel': sd['weight'].transpose(0, 3, 4, 2, 1),
            'expert_bias': sd['bias'],
            'routing_func.0': {
                'kernel': sd['routing_func.0.weight'].transpose(1, 0),
                'bias': sd['routing_func.0.bias']},
            'se.0': {'kernel': sd['se.0.weight'].transpose(2, 3, 1, 0),
                     'bias': sd['se.0.bias']},
            'se.2': {'kernel': sd['se.2.weight'].transpose(2, 3, 1, 0),
                     'bias': sd['se.2.bias']},
        }}


def run_blocks(x, block_cls, num_blocks, prefix, *args, **kwargs):
    """Apply ``num_blocks`` identical blocks named '<prefix>.<i>' — the
    flax analogue of make_layer + nn.Sequential
    (reference arch_util.py:73-87). Must be called inside a compact
    module."""
    for i in range(num_blocks):
        x = block_cls(**kwargs, name=f'{prefix}.{i}')(x, *args)
    return x


def upsample_pixelshuffle(x, scale, num_feat, prefix='upsample'):
    """Conv + PixelShuffle upsampler for scales 2^n / 3
    (reference arch_util.py:120-141). Conv children named
    '<prefix>.0', '<prefix>.2', ... to match the torch nn.Sequential
    state dict (PixelShuffle layers own the odd indices). Must be called
    inside a compact module."""
    idx = 0
    if (scale & (scale - 1)) == 0:  # power of 2
        for _ in range(int(math.log2(scale))):
            x = nn.Conv(4 * num_feat, (3, 3), padding=1,
                        name=f'{prefix}.{idx}')(x)
            x = pixel_shuffle(x, 2)
            idx += 2
    elif scale == 3:
        x = nn.Conv(9 * num_feat, (3, 3), padding=1,
                    name=f'{prefix}.{idx}')(x)
        x = pixel_shuffle(x, 3)
    else:
        raise ValueError(f'scale {scale} is not supported. '
                         'Supported scales: 2^n and 3.')
    return x
