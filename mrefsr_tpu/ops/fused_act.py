"""Bias + LeakyReLU + scale, as used by StyleGAN2.

The reference ships a CUDA kernel for this (basicsr/ops/fused_act/
fused_bias_act_kernel.cu, wrapper fused_act.py:81-111); on TPU the whole
expression fuses inside XLA, so this is a named composition, kept as an op
for API parity.
"""
import jax
import jax.numpy as jnp


def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2**0.5):
    """NHWC fused bias-add + leaky relu + sqrt(2) scale."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale
