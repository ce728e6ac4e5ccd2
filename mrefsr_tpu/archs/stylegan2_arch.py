"""StyleGAN2 generator/discriminator, flax/NHWC
(reference basicsr/archs/stylegan2_arch.py).

TPU notes:
* The reference's ModulatedConv2d builds a per-sample weight tensor and
  runs a grouped conv with ``groups=b`` (stylegan2_arch.py:243-278) —
  poison for the MXU. Since modulation is per-input-channel and
  demodulation per-output-channel, the identical math factors into
  ``conv(x * style_in, shared_w) * demod_out``: one large batched conv.
* upfirdn2d / fused_leaky_relu come from mrefsr_tpu.ops (XLA-fused; the
  reference needs custom CUDA for these).
* Checkpoint import: param names/layouts chosen so the standard
  torch->flax converter plus :func:`stylegan2_rename` reproduce the
  reference .pth layout (modulated weights keep their torch
  (1,out,in,k,k) layout under the name ``mod_weight``).
"""
import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mrefsr_tpu.ops import fused_leaky_relu, upfirdn2d
from mrefsr_tpu.utils.registry import ARCH_REGISTRY


def make_resample_kernel(k):
    """1D magnitudes -> normalized 2D FIR kernel (reference :26-40)."""
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return jnp.asarray(k / k.sum())


def norm_style_code(x):
    """(reference NormStyleCode :12-23)"""
    return x * jax.lax.rsqrt(jnp.mean(x**2, axis=1, keepdims=True) + 1e-8)


class EqualLinear(nn.Module):
    """Equalized linear (reference :134-180). Param layout (in, out) as
    produced by the torch->flax converter."""
    in_channels: int
    out_channels: int
    use_bias: bool = True
    bias_init_val: float = 0.
    lr_mul: float = 1.
    activation: Any = None

    @nn.compact
    def __call__(self, x):
        scale = (1 / math.sqrt(self.in_channels)) * self.lr_mul
        kernel = self.param(
            'kernel',
            lambda rng, shape: jax.random.normal(rng, shape) / self.lr_mul,
            (self.in_channels, self.out_channels))
        bias = None
        if self.use_bias:
            bias = self.param(
                'bias', lambda rng, shape: jnp.full(
                    shape, self.bias_init_val, jnp.float32),
                (self.out_channels,)) * self.lr_mul
        out = x @ (kernel * scale)
        if self.activation == 'fused_lrelu':
            return fused_leaky_relu(out, bias)
        if bias is not None:
            out = out + bias
        return out


def _smooth(x, kernel, upsample_factor, downsample_factor, kernel_size):
    """UpFirDnSmooth (reference :97-131)."""
    k = kernel
    if upsample_factor > 1:
        k = k * (upsample_factor**2)
        pad = (k.shape[0] - upsample_factor) - (kernel_size - 1)
        pad = ((pad + 1) // 2 + upsample_factor - 1, pad // 2 + 1)
    elif downsample_factor > 1:
        pad = (k.shape[0] - downsample_factor) + (kernel_size - 1)
        pad = ((pad + 1) // 2, pad // 2)
    else:
        raise NotImplementedError
    return upfirdn2d(x, k, up=1, down=1, pad=pad)


def upfirdn_upsample(x, kernel, factor=2):
    """(reference UpFirDnUpsample :43-69)"""
    k = kernel * (factor**2)
    pad = k.shape[0] - factor
    return upfirdn2d(x, k, up=factor, down=1,
                     pad=((pad + 1) // 2 + factor - 1, pad // 2))


def upfirdn_downsample(x, kernel, factor=2):
    """(reference UpFirDnDownsample :72-94)"""
    pad = kernel.shape[0] - factor
    return upfirdn2d(x, kernel, up=1, down=factor,
                     pad=((pad + 1) // 2, pad // 2))


class FusedLeakyReLU(nn.Module):
    """Bias-owning fused leaky-relu module (reference
    ops/fused_act/fused_act.py:81-92); a real child scope so torch keys
    like ``style_conv1.activate.bias`` convert 1:1."""
    num_channels: int

    @nn.compact
    def __call__(self, x):
        bias = self.param('bias', nn.initializers.zeros,
                          (self.num_channels,))
        return fused_leaky_relu(x, bias)


class ConstantInput(nn.Module):
    """Learned constant input (reference :377-392), NHWC."""
    num_channel: int
    size: int

    @nn.compact
    def __call__(self, batch):
        const = self.param('const', nn.initializers.normal(1.0),
                           (1, self.size, self.size, self.num_channel))
        return jnp.repeat(const, batch, axis=0)


class ModulatedConv2d(nn.Module):
    """Modulated conv (reference :182-285), factored form (see module
    docstring): conv(x * s_in) * demod_out with a shared kernel."""
    in_channels: int
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: Any = None
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, style):
        b = x.shape[0]
        k = self.kernel_size
        scale = 1 / math.sqrt(self.in_channels * k**2)
        # torch-layout (1, out, in, k, k) so .pth weights import verbatim
        w = self.param('mod_weight', nn.initializers.normal(1.0),
                       (1, self.out_channels, self.in_channels, k, k))
        style = EqualLinear(self.num_style_feat, self.in_channels,
                            use_bias=True, bias_init_val=1,
                            name='modulation')(style)  # (b, c_in)

        weight = scale * w * style[:, None, :, None, None]
        if self.demodulate:
            demod = jax.lax.rsqrt(
                jnp.sum(weight**2, axis=(2, 3, 4)) + self.eps)  # (b, out)
        kernel = jnp.transpose(scale * w[0], (2, 3, 1, 0))  # HWIO

        x = x * style[:, None, None, :]
        resample = make_resample_kernel(self.resample_kernel)
        if self.sample_mode == 'upsample':
            # torch F.conv_transpose2d == lax.conv_transpose with
            # transpose_kernel=True and the kernel laid out (k, k, out, in)
            kernel_t = jnp.transpose(scale * w[0], (2, 3, 0, 1))
            out = jax.lax.conv_transpose(
                x, kernel_t, strides=(2, 2), padding='VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                transpose_kernel=True)
            if self.demodulate:
                out = out * demod[:, None, None, :]
            out = _smooth(out, resample, 2, 1, k)
        elif self.sample_mode == 'downsample':
            x = _smooth(x, resample, 1, 2, k)
            out = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(2, 2), padding='VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            if self.demodulate:
                out = out * demod[:, None, None, :]
        else:
            out = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(1, 1),
                padding=[(k // 2, k // 2)] * 2,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            if self.demodulate:
                out = out * demod[:, None, None, :]
        return out


class StyleConv(nn.Module):
    """Modulated conv + noise injection + fused lrelu
    (reference :288-333)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: Any = None
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, noise=None):
        out = ModulatedConv2d(
            self.in_channels, self.out_channels, self.kernel_size,
            self.num_style_feat, demodulate=self.demodulate,
            sample_mode=self.sample_mode,
            resample_kernel=self.resample_kernel,
            name='modulated_conv')(x, style)
        noise_weight = self.param('weight', nn.initializers.zeros, (1,))
        if noise is None:
            b, h, w, _ = out.shape
            noise = jax.random.normal(self.make_rng('noise'),
                                      (b, h, w, 1), out.dtype)
        out = out + noise_weight * noise
        return FusedLeakyReLU(self.out_channels, name='activate')(out)


class ToRGB(nn.Module):
    """Feature -> RGB with skip (reference :336-374)."""
    in_channels: int
    num_style_feat: int
    upsample: bool = True
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv2d(
            self.in_channels, 3, kernel_size=1,
            num_style_feat=self.num_style_feat, demodulate=False,
            sample_mode=None, name='modulated_conv')(x, style)
        bias = self.param('bias', nn.initializers.zeros, (1, 3, 1, 1))
        out = out + bias.reshape(1, 1, 1, 3)
        if skip is not None:
            if self.upsample:
                skip = upfirdn_upsample(
                    skip, make_resample_kernel(self.resample_kernel))
            out = out + skip
        return out


def _sg2_channels(channel_multiplier, narrow):
    return {
        '4': int(512 * narrow), '8': int(512 * narrow),
        '16': int(512 * narrow), '32': int(512 * narrow),
        '64': int(256 * channel_multiplier * narrow),
        '128': int(128 * channel_multiplier * narrow),
        '256': int(64 * channel_multiplier * narrow),
        '512': int(32 * channel_multiplier * narrow),
        '1024': int(16 * channel_multiplier * narrow),
    }


class StyleMLP(nn.Module):
    """The generator's z->w mapping network ALONE, with the same flat
    param names ('style_mlp.{i+1}') as StyleGAN2Generator — apply it on
    the style_mlp.* subtree of the generator's params to compute mean
    latents / truncation anchors without synthesizing images (the
    reference's g_ema.mean_latent(), stylegan2_arch.py:491-495)::

        mlp_params = {k: v for k, v in gen_params.items()
                      if k.startswith('style_mlp.')}
        w = StyleMLP(num_style_feat, num_mlp, lr_mlp).apply(
            {'params': mlp_params}, z)
    """
    num_style_feat: int = 512
    num_mlp: int = 8
    lr_mlp: float = 0.01

    @nn.compact
    def __call__(self, s):
        s = norm_style_code(s)
        for i in range(self.num_mlp):
            s = EqualLinear(self.num_style_feat, self.num_style_feat,
                            use_bias=True, bias_init_val=0,
                            lr_mul=self.lr_mlp, activation='fused_lrelu',
                            name=f'style_mlp.{i + 1}')(s)
        return s


@ARCH_REGISTRY.register()
class StyleGAN2Generator(nn.Module):
    """StyleGAN2 generator (reference :395-586). NHWC output.

    `styles` is a tuple of (b, num_style_feat) codes (1 or 2 entries).
    Style mixing uses a traced index mask instead of a dynamic concat so
    any inject_index runs in one compiled graph.
    """
    out_size: int
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: int = 2
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    narrow: float = 1.0

    @property
    def log_size(self):
        return int(math.log(self.out_size, 2))

    @property
    def num_layers(self):
        return (self.log_size - 2) * 2 + 1

    @property
    def num_latent(self):
        return self.log_size * 2 - 2

    @nn.compact
    def __call__(self, styles, input_is_latent=False, noise=None,
                 randomize_noise=True, truncation=1,
                 truncation_latent=None, inject_index=None,
                 return_latents=False):
        channels = _sg2_channels(self.channel_multiplier, self.narrow)
        if not isinstance(styles, (list, tuple)):
            styles = [styles]
        if not input_is_latent:
            # one shared MLP instance, reusable across style codes
            mlp_layers = [
                EqualLinear(self.num_style_feat, self.num_style_feat,
                            use_bias=True, bias_init_val=0,
                            lr_mul=self.lr_mlp, activation='fused_lrelu',
                            name=f'style_mlp.{i + 1}')
                for i in range(self.num_mlp)
            ]

            def run_mlp(s):
                s = norm_style_code(s)
                for layer in mlp_layers:
                    s = layer(s)
                return s

            styles = [run_mlp(s) for s in styles]
        if noise is None:
            if randomize_noise:
                noise = [None] * self.num_layers
            else:
                noise = [
                    self.param(f'noises.noise{i}',
                               nn.initializers.normal(1.0),
                               (1, 2**((i + 5) // 2), 2**((i + 5) // 2),
                                1))
                    for i in range(self.num_layers)
                ]
        if truncation < 1:
            styles = [truncation_latent + truncation
                      * (style - truncation_latent) for style in styles]

        if len(styles) == 1:
            if styles[0].ndim < 3:
                latent = jnp.repeat(styles[0][:, None], self.num_latent,
                                    axis=1)
            else:
                latent = styles[0]
        elif len(styles) == 2:
            if inject_index is None:
                if self.has_rng('mixing'):
                    # per-call crossover point even under jit
                    inject_index = jax.random.randint(
                        self.make_rng('mixing'), (), 1, self.num_latent)
                else:
                    # trace-time draw: under jit this bakes ONE
                    # crossover point into the compiled graph — pass
                    # inject_index (the in-repo model does) or supply a
                    # 'mixing' rng for per-step style mixing
                    import random as _pyrandom
                    inject_index = _pyrandom.randint(
                        1, self.num_latent - 1)
            l1 = jnp.repeat(styles[0][:, None], self.num_latent, axis=1)
            l2 = jnp.repeat(styles[1][:, None], self.num_latent, axis=1)
            mask = (jnp.arange(self.num_latent) <
                    inject_index)[None, :, None]
            latent = jnp.where(mask, l1, l2)
        else:
            raise ValueError('styles must have 1 or 2 entries')

        b = latent.shape[0]
        out = ConstantInput(channels['4'], 4, name='constant_input')(b)
        out = StyleConv(channels['4'], channels['4'], 3,
                        self.num_style_feat, demodulate=True,
                        sample_mode=None,
                        resample_kernel=self.resample_kernel,
                        name='style_conv1')(out, latent[:, 0],
                                            noise=noise[0])
        skip = ToRGB(channels['4'], self.num_style_feat, upsample=False,
                     name='to_rgb1')(out, latent[:, 1])

        in_ch = channels['4']
        i = 1
        conv_idx = 0
        for res_log in range(3, self.log_size + 1):
            out_ch = channels[f'{2**res_log}']
            out = StyleConv(in_ch, out_ch, 3, self.num_style_feat,
                            demodulate=True, sample_mode='upsample',
                            resample_kernel=self.resample_kernel,
                            name=f'style_convs.{conv_idx}')(
                                out, latent[:, i], noise=noise[i])
            out = StyleConv(out_ch, out_ch, 3, self.num_style_feat,
                            demodulate=True, sample_mode=None,
                            resample_kernel=self.resample_kernel,
                            name=f'style_convs.{conv_idx + 1}')(
                                out, latent[:, i + 1], noise=noise[i + 1])
            skip = ToRGB(out_ch, self.num_style_feat, upsample=True,
                         resample_kernel=self.resample_kernel,
                         name=f'to_rgbs.{conv_idx // 2}')(
                             out, latent[:, i + 2], skip)
            in_ch = out_ch
            i += 2
            conv_idx += 2

        if return_latents:
            return skip, latent
        return skip, None


def scaled_leaky_relu(x, negative_slope=0.2):
    """(reference ScaledLeakyReLU :589-602)"""
    return jax.nn.leaky_relu(x, negative_slope) * math.sqrt(2)


class EqualConv2d(nn.Module):
    """Equalized conv (reference :605-651). Kernel stored HWIO."""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    bias_init_val: float = 0.

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        scale = 1 / math.sqrt(self.in_channels * k**2)
        kernel = self.param('kernel', nn.initializers.normal(1.0),
                            (k, k, self.in_channels, self.out_channels))
        out = jax.lax.conv_general_dilated(
            x, kernel * scale, window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            bias = self.param(
                'bias', lambda rng, shape: jnp.full(shape,
                                                    self.bias_init_val),
                (self.out_channels,))
            out = out + bias
        return out


def conv_layer(x, in_channels, out_channels, kernel_size, prefix,
               downsample=False, resample_kernel=(1, 3, 3, 1),
               use_bias=True, activate=True):
    """ConvLayer (reference :654-701) as a scope-transparent helper:
    the torch nn.Sequential's numeric children become ``{prefix}.{i}``
    modules in the caller's scope, matching converted .pth keys."""
    idx = 0
    if downsample:
        x = _smooth(x, make_resample_kernel(resample_kernel), 1, 2,
                    kernel_size)
        stride, padding = 2, 0
        idx = 1
    else:
        stride, padding = 1, kernel_size // 2
    x = EqualConv2d(in_channels, out_channels, kernel_size, stride=stride,
                    padding=padding,
                    use_bias=use_bias and not activate,
                    name=f'{prefix}.{idx}')(x)
    if activate:
        if use_bias:
            x = FusedLeakyReLU(out_channels, name=f'{prefix}.{idx + 1}')(x)
        else:
            x = scaled_leaky_relu(x, 0.2)
    return x


class ResBlock(nn.Module):
    """D residual block (reference :704-731)."""
    in_channels: int
    out_channels: int
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        out = conv_layer(x, self.in_channels, self.in_channels, 3,
                         'conv1', use_bias=True, activate=True)
        out = conv_layer(out, self.in_channels, self.out_channels, 3,
                         'conv2', downsample=True,
                         resample_kernel=self.resample_kernel,
                         use_bias=True, activate=True)
        skip = conv_layer(x, self.in_channels, self.out_channels, 1,
                          'skip', downsample=True,
                          resample_kernel=self.resample_kernel,
                          use_bias=False, activate=False)
        return (out + skip) / math.sqrt(2)


@ARCH_REGISTRY.register()
class StyleGAN2Discriminator(nn.Module):
    """StyleGAN2 discriminator (reference :734-799). NHWC input."""
    out_size: int
    channel_multiplier: int = 2
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    stddev_group: int = 4
    narrow: float = 1.0

    @nn.compact
    def __call__(self, x):
        channels = _sg2_channels(self.channel_multiplier, self.narrow)
        log_size = int(math.log(self.out_size, 2))

        x = conv_layer(x, 3, channels[f'{self.out_size}'], 1,
                       'conv_body.0', use_bias=True, activate=True)
        in_ch = channels[f'{self.out_size}']
        idx = 1
        for i in range(log_size, 2, -1):
            out_ch = channels[f'{2**(i - 1)}']
            x = ResBlock(in_ch, out_ch, self.resample_kernel,
                         name=f'conv_body.{idx}')(x)
            in_ch = out_ch
            idx += 1

        b, h, w, c = x.shape
        group = min(b, self.stddev_group)
        stddev = x.reshape(group, -1, h, w, 1, c)
        stddev = jnp.sqrt(jnp.var(stddev, axis=0) + 1e-8)
        stddev = jnp.mean(stddev, axis=(1, 2, 3, 4))  # (b//group,)
        stddev = jnp.tile(stddev.reshape(-1, 1, 1, 1), (group, h, w, 1))
        x = jnp.concatenate([x, stddev], axis=-1)

        x = conv_layer(x, in_ch + 1, channels['4'], 3, 'final_conv',
                       use_bias=True, activate=True)
        # torch flattens NCHW: (b, c*4*4) with channel-major order
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        x = EqualLinear(channels['4'] * 4 * 4, channels['4'],
                        use_bias=True, activation='fused_lrelu',
                        name='final_linear.0')(x)
        x = EqualLinear(channels['4'], 1, use_bias=True,
                        name='final_linear.1')(x)
        return x


def stylegan2_rename(key):
    """torch .pth key adapter for StyleGAN2 checkpoints: route params the
    generic converter would mangle to their custom flax names."""
    if key.endswith('modulated_conv.weight'):
        return key.replace('modulated_conv.weight',
                           'modulated_conv.mod_weight')
    if key == 'constant_input.weight':
        return 'constant_input.const'  # handled via reshape in loader
    if '.activate.bias' in key:
        return key
    return key
