"""HiFaceGAN building blocks, flax/NHWC
(reference basicsr/archs/hifacegan_util.py).

Spectral normalization is a first-class module here: the kernel and the
power-iteration vectors (collection 'spectral', matching torch's
weight_u/weight_v buffers via the converter) are explicit, and one
power iteration runs per call when 'spectral' is mutable — the same
train/eval semantics as torch.nn.utils.spectral_norm.
"""
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _l2norm(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


class InstanceNorm2d(nn.Module):
    """Per-sample, per-channel normalization over H, W (torch
    InstanceNorm2d semantics, eps=1e-5). Affine params keep torch names
    weight/bias so checkpoints convert mechanically."""
    affine: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mu = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            c = x.shape[-1]
            y = y * self.param('weight', nn.initializers.ones, (c,))
            y = y + self.param('bias', nn.initializers.zeros, (c,))
        return y


class SNConv(nn.Module):
    """Spectral-normalized conv. u/v live in the 'spectral' collection;
    when it is mutable one torch-order power iteration runs
    (v = norm(W^T u), u = norm(W v)), else the stored vectors are used
    — matching torch train/eval behavior."""
    features: int
    kernel_size: Tuple[int, int]
    strides: int = 1
    padding: Any = 0
    use_bias: bool = True
    kernel_dilation: int = 1  # rhs_dilation (DFDNet's MSDilationBlock)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features))
        # torch reshapes the OIHW weight to (out, in*kh*kw)
        w_mat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(
            self.features, -1)
        u = self.variable('spectral', 'u',
                          lambda: _l2norm(jax.random.normal(
                              jax.random.PRNGKey(0), (self.features,))))
        v = self.variable('spectral', 'v',
                          lambda: _l2norm(jax.random.normal(
                              jax.random.PRNGKey(1),
                              (w_mat.shape[1],))))
        if self.is_mutable_collection('spectral'):
            v_new = _l2norm(w_mat.T @ u.value)
            u_new = _l2norm(w_mat @ v_new)
            u.value = jax.lax.stop_gradient(u_new)
            v.value = jax.lax.stop_gradient(v_new)
        sigma = u.value @ (w_mat @ v.value)
        kernel_sn = kernel / sigma

        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        out = jax.lax.conv_general_dilated(
            x, kernel_sn, window_strides=(self.strides, self.strides),
            padding=pad,
            rhs_dilation=(self.kernel_dilation, self.kernel_dilation),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            out = out + self.param('bias', nn.initializers.zeros,
                                   (self.features,))
        return out


class SPADE(nn.Module):
    """Spatially-adaptive (de)normalization
    (reference hifacegan_util.py:12-54). config 'spadesyncbatch3x3' etc.
    falls back to instance norm, like the reference under single-GPU."""
    config_text: str
    norm_nc: int
    label_nc: int

    @nn.compact
    def __call__(self, x, segmap):
        import re
        parsed = re.search('spade(\\D+)(\\d)x\\d', self.config_text)
        norm_type = str(parsed.group(1))
        ks = int(parsed.group(2))
        if norm_type in ('instance', 'syncbatch'):
            normalized = InstanceNorm2d(affine=False)(x)
        elif norm_type == 'batch':
            normalized = nn.BatchNorm(
                use_running_average=True, use_bias=False, use_scale=False,
                name='param_free_norm')(x)
        else:
            raise ValueError(f'{norm_type} is not a recognized param-free '
                             'norm type in SPADE')

        nhidden = 128 if self.norm_nc > 128 else self.norm_nc
        pw = ks // 2
        n, h, w, _ = x.shape
        # nearest resize of the guidance map to x's size
        sy = jnp.clip((jnp.arange(h) * (segmap.shape[1] / h)).astype(
            jnp.int32), 0, segmap.shape[1] - 1)
        sx = jnp.clip((jnp.arange(w) * (segmap.shape[2] / w)).astype(
            jnp.int32), 0, segmap.shape[2] - 1)
        segmap = segmap[:, sy][:, :, sx]
        actv = nn.relu(nn.Conv(nhidden, (ks, ks), padding=pw,
                               name='mlp_shared.0')(segmap))
        gamma = nn.Conv(self.norm_nc, (ks, ks), padding=pw, use_bias=False,
                        name='mlp_gamma')(actv)
        beta = nn.Conv(self.norm_nc, (ks, ks), padding=pw, use_bias=False,
                       name='mlp_beta')(actv)
        return normalized * gamma + beta


class SPADEResnetBlock(nn.Module):
    """(reference hifacegan_util.py:57-111)"""
    fin: int
    fout: int
    norm_g: str = 'spectralspadesyncbatch3x3'
    semantic_nc: int = 3

    @nn.compact
    def __call__(self, x, seg):
        learned_shortcut = self.fin != self.fout
        fmiddle = min(self.fin, self.fout)
        spectral = 'spectral' in self.norm_g
        spade_config = self.norm_g.replace('spectral', '')
        conv_cls = SNConv if spectral else \
            (lambda f, k, **kw: nn.Conv(f, k, **kw))

        def act(v):
            return jax.nn.leaky_relu(v, 0.2)

        dx = SPADE(spade_config, self.fin, self.semantic_nc,
                   name='norm_0')(x, seg)
        dx = conv_cls(fmiddle, (3, 3), padding=1, name='conv_0')(act(dx))
        dx = SPADE(spade_config, fmiddle, self.semantic_nc,
                   name='norm_1')(dx, seg)
        dx = conv_cls(self.fout, (3, 3), padding=1, name='conv_1')(act(dx))

        if learned_shortcut:
            x_s = SPADE(spade_config, self.fin, self.semantic_nc,
                        name='norm_s')(x, seg)
            x_s = conv_cls(self.fout, (1, 1), use_bias=False,
                           name='conv_s')(x_s)
        else:
            x_s = x
        return x_s + dx


def lip2d(x, logit, kernel=3, stride=2, padding=1):
    """Local importance pooling (reference hifacegan_util.py:154-157):
    ratio of avg pools of weighted and weights."""
    weight = jnp.exp(logit)

    def avg(v):
        return jax.lax.reduce_window(
            v, 0., jax.lax.add, (1, kernel, kernel, 1),
            (1, stride, stride, 1),
            [(0, 0), (padding, padding), (padding, padding),
             (0, 0)]) / (kernel * kernel)

    return avg(x * weight) / avg(weight)


SOFTGATE_COEFF = 12.0


class SimplifiedLIP(nn.Module):
    """(reference hifacegan_util.py:166-180)"""
    channels: int

    @nn.compact
    def __call__(self, x):
        logit = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                        name='logit.0')(x)
        logit = InstanceNorm2d(affine=True, name='logit.1')(logit)
        logit = jax.nn.sigmoid(logit) * SOFTGATE_COEFF
        return lip2d(x, logit)


class LIPEncoder(nn.Module):
    """Local-importance-pooling encoder
    (reference hifacegan_util.py:182-214)."""
    input_nc: int
    ngf: int
    sw: int
    sh: int
    n_2xdown: int

    @nn.compact
    def __call__(self, x):
        max_ratio = 16
        x = nn.Conv(self.ngf, (3, 3), padding=1, use_bias=False,
                    name='model.0')(x)
        x = InstanceNorm2d(affine=False)(x)
        x = nn.relu(x)
        cur_ratio = 1
        idx = 3
        for i in range(self.n_2xdown):
            next_ratio = min(cur_ratio * 2, max_ratio)
            x = SimplifiedLIP(self.ngf * cur_ratio,
                              name=f'model.{idx}')(x)
            x = nn.Conv(self.ngf * next_ratio, (3, 3), padding=1,
                        name=f'model.{idx + 1}')(x)
            x = InstanceNorm2d(affine=False)(x)
            cur_ratio = next_ratio
            if i < self.n_2xdown - 1:
                x = nn.relu(x)
                idx += 4
            else:
                idx += 3
        return x
