"""SwinIR: shifted-window transformer for image restoration, flax/NHWC.

Behavioral rebuild of reference basicsr/archs/swinir_arch.py:95-956.
Module/param names mirror the torch layout (layers.{i}.residual_group.
blocks.{j}.attn.qkv ...) for .pth import; deterministic buffers
(relative_position_index, attn_mask) are recomputed instead of loaded.

TPU notes: window partition/reverse are pure reshapes; the attention is
einsum-based and padded windows keep shapes static. Stochastic depth
(drop_path_rate, linearly increasing per block like the reference) runs
when a 'droppath' rng is supplied at apply — SRModel's train step does
this automatically; inference is identity like torch eval. drop_rate /
attn_drop_rate are inference-identity (SR checkpoints ship with 0).
"""
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mrefsr_tpu.ops import interpolate, pixel_shuffle
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .arch_util import upsample_pixelshuffle


class TorchLayerNorm(nn.Module):
    """LayerNorm with torch param names (weight/bias) so checkpoints map
    without renames."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        weight = self.param('weight', nn.initializers.ones, (dim,))
        bias = self.param('bias', nn.initializers.zeros, (dim,))
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean)**2).mean(-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * weight + bias


class PatchEmbedNorm(nn.Module):
    """Nested wrapper so params land at patch_embed/norm/* like the torch
    state dict's ``patch_embed.norm.{weight,bias}``."""

    @nn.compact
    def __call__(self, x):
        return TorchLayerNorm(name='norm')(x)


def window_partition(x, window_size):
    """(B,H,W,C) -> (num_windows*B, ws, ws, C) (reference :60-74)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window_size, window_size, w // window_size,
                  window_size, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size,
                                                 window_size, c)


def window_reverse(windows, window_size, h, w):
    """Inverse of window_partition (reference :77-92)."""
    b = windows.shape[0] // (h * w // window_size // window_size)
    x = windows.reshape(b, h // window_size, w // window_size, window_size,
                        window_size, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(ws):
    """Deterministic relative-position index buffer (reference :122-134)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing='ij'))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws*ws, ws*ws)


def _attn_mask(h, w, window_size, shift_size):
    """SW-MSA attention mask (reference calculate_mask :262-281)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    slices = (slice(0, -window_size), slice(-window_size, -shift_size),
              slice(-shift_size, None))
    cnt = 0
    for hs in slices:
        for ws_ in slices:
            img_mask[:, hs, ws_, :] = cnt
            cnt += 1
    mask_windows = np.reshape(
        img_mask.reshape(1, h // window_size, window_size,
                         w // window_size, window_size, 1).transpose(
            0, 1, 3, 2, 4, 5), (-1, window_size * window_size))
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    attn_mask = np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
    return attn_mask  # (nW, n, n)


class Mlp(nn.Module):
    hidden_features: int
    out_features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, name='fc1')(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_features, name='fc2')(x)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference :95-177)."""
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float = None

    @nn.compact
    def __call__(self, x, mask=None):
        b_, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = self.qk_scale or hd**-0.5
        ws = self.window_size

        # flax truncated_normal == the reference's arch_util.trunc_normal_
        # (arch_util.py:359) used on this table
        bias_table = self.param(
            'relative_position_bias_table',
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), nh))
        rel_index = _relative_position_index(ws)

        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, name='qkv')(x)
        qkv = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (b_, nh, n, hd)

        attn = jnp.einsum('bhnd,bhmd->bhnm', q * scale, k,
                          preferred_element_type=jnp.float32)
        rel_bias = bias_table[rel_index.reshape(-1)].reshape(
            n, n, -1).transpose(2, 0, 1)
        attn = attn + rel_bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + \
                mask[None, :, None]
            attn = attn.reshape(-1, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)

        x = jnp.einsum('bhnm,bhmd->bhnd', attn, v,
                       preferred_element_type=jnp.float32
                       ).astype(x.dtype)
        x = x.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, name='proj')(x)


class SwinTransformerBlock(nn.Module):
    """(reference :194-328)"""
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.
    qkv_bias: bool = True
    qk_scale: float = None
    drop_path: float = 0.

    def _drop_path(self, v):
        """Per-sample stochastic depth (reference timm DropPath used at
        :259): active only when a 'droppath' rng is supplied (training);
        identity at inference like torch eval."""
        if self.drop_path <= 0. or not self.has_rng('droppath'):
            return v
        keep = 1.0 - self.drop_path
        shape = (v.shape[0],) + (1,) * (v.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng('droppath'), keep,
                                    shape)
        return v * mask.astype(v.dtype) / keep

    @nn.compact
    def __call__(self, x, x_size):
        h, w = x_size
        b, _, c = x.shape
        window_size = self.window_size
        shift_size = self.shift_size
        if min(self.input_resolution) <= window_size:
            shift_size = 0
            window_size = min(self.input_resolution)

        shortcut = x
        x = TorchLayerNorm(name='norm1')(x)
        x = x.reshape(b, h, w, c)

        if shift_size > 0:
            shifted_x = jnp.roll(x, (-shift_size, -shift_size),
                                 axis=(1, 2))
        else:
            shifted_x = x

        x_windows = window_partition(shifted_x, window_size)
        x_windows = x_windows.reshape(-1, window_size * window_size, c)

        mask = None
        if shift_size > 0:
            mask = jnp.asarray(_attn_mask(h, w, window_size, shift_size))
        attn_windows = WindowAttention(
            self.dim, window_size, self.num_heads, self.qkv_bias,
            self.qk_scale, name='attn')(x_windows, mask)

        attn_windows = attn_windows.reshape(-1, window_size, window_size,
                                            c)
        shifted_x = window_reverse(attn_windows, window_size, h, w)

        if shift_size > 0:
            x = jnp.roll(shifted_x, (shift_size, shift_size), axis=(1, 2))
        else:
            x = shifted_x
        x = x.reshape(b, h * w, c)

        x = shortcut + self._drop_path(x)
        x = x + self._drop_path(
            Mlp(int(self.dim * self.mlp_ratio), self.dim,
                name='mlp')(TorchLayerNorm(name='norm2')(x)))
        return x


class BasicLayer(nn.Module):
    """One Swin stage (reference :395-478)."""
    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.
    qkv_bias: bool = True
    qk_scale: float = None
    drop_path: Sequence[float] = ()

    @nn.compact
    def __call__(self, x, x_size):
        for i in range(self.depth):
            x = SwinTransformerBlock(
                self.dim, self.input_resolution, self.num_heads,
                self.window_size,
                0 if i % 2 == 0 else self.window_size // 2,
                self.mlp_ratio, self.qkv_bias, self.qk_scale,
                self.drop_path[i] if self.drop_path else 0.,
                name=f'blocks.{i}')(x, x_size)
        return x


class RSTB(nn.Module):
    """Residual Swin Transformer Block (reference :480-568)."""
    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.
    qkv_bias: bool = True
    qk_scale: float = None
    resi_connection: str = '1conv'
    drop_path: Sequence[float] = ()

    @nn.compact
    def __call__(self, x, x_size):
        res = BasicLayer(self.dim, self.input_resolution, self.depth,
                         self.num_heads, self.window_size, self.mlp_ratio,
                         self.qkv_bias, self.qk_scale, self.drop_path,
                         name='residual_group')(x, x_size)
        h, w = x_size
        b, _, c = res.shape
        img = res.reshape(b, h, w, c)
        if self.resi_connection == '1conv':
            img = nn.Conv(self.dim, (3, 3), padding=1, name='conv')(img)
        else:  # 3conv
            img = nn.Conv(self.dim // 4, (3, 3), padding=1,
                          name='conv.0')(img)
            img = jax.nn.leaky_relu(img, 0.2)
            img = nn.Conv(self.dim // 4, (1, 1), name='conv.2')(img)
            img = jax.nn.leaky_relu(img, 0.2)
            img = nn.Conv(self.dim, (3, 3), padding=1, name='conv.4')(img)
        return img.reshape(b, h * w, c) + x


@ARCH_REGISTRY.register()
class SwinIR(nn.Module):
    """(reference :694-936). Input NHWC [0,1]."""
    img_size: int = 64
    patch_size: int = 1
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 7
    mlp_ratio: float = 4.
    qkv_bias: bool = True
    qk_scale: float = None
    drop_rate: float = 0.
    attn_drop_rate: float = 0.
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    use_checkpoint: bool = False
    upscale: int = 2
    img_range: float = 1.
    upsampler: str = ''
    resi_connection: str = '1conv'

    @nn.compact
    def __call__(self, x):
        if self.in_chans == 3:
            mean = jnp.asarray((0.4488, 0.4371, 0.4040), x.dtype)
        else:
            mean = jnp.zeros((1,), x.dtype)
        x = (x - mean) * self.img_range

        num_feat = 64
        h, w = x.shape[1], x.shape[2]
        img_size = (self.img_size, self.img_size) if isinstance(
            self.img_size, int) else tuple(self.img_size)
        patches_resolution = (img_size[0] // self.patch_size,
                              img_size[1] // self.patch_size)

        def forward_features(feat):
            b = feat.shape[0]
            fh, fw = feat.shape[1], feat.shape[2]
            seq = feat.reshape(b, fh * fw, self.embed_dim)
            if self.patch_norm:
                seq = PatchEmbedNorm(name='patch_embed')(seq)
            if self.ape:
                ape = self.param('absolute_pos_embed',
                                 nn.initializers.truncated_normal(0.02),
                                 (1, patches_resolution[0] *
                                  patches_resolution[1], self.embed_dim))
                seq = seq + ape
            # per-block stochastic-depth rates, linearly increasing over
            # ALL blocks like the reference (:694-728 dpr linspace);
            # active only when a 'droppath' rng is supplied at apply
            dpr = np.linspace(0, self.drop_path_rate,
                              sum(self.depths)).tolist()
            for i in range(len(self.depths)):
                lo = sum(self.depths[:i])
                seq = RSTB(self.embed_dim, patches_resolution,
                           self.depths[i], self.num_heads[i],
                           self.window_size, self.mlp_ratio,
                           self.qkv_bias, self.qk_scale,
                           self.resi_connection,
                           tuple(dpr[lo:lo + self.depths[i]]),
                           name=f'layers.{i}')(seq, (fh, fw))
            seq = TorchLayerNorm(name='norm')(seq)
            return seq.reshape(b, fh, fw, self.embed_dim)

        def conv_after_body(feat):
            if self.resi_connection == '1conv':
                return nn.Conv(self.embed_dim, (3, 3), padding=1,
                               name='conv_after_body')(feat)
            feat = nn.Conv(self.embed_dim // 4, (3, 3), padding=1,
                           name='conv_after_body.0')(feat)
            feat = jax.nn.leaky_relu(feat, 0.2)
            feat = nn.Conv(self.embed_dim // 4, (1, 1),
                           name='conv_after_body.2')(feat)
            feat = jax.nn.leaky_relu(feat, 0.2)
            return nn.Conv(self.embed_dim, (3, 3), padding=1,
                           name='conv_after_body.4')(feat)

        if self.upsampler == 'pixelshuffle':
            feat = nn.Conv(self.embed_dim, (3, 3), padding=1,
                           name='conv_first')(x)
            feat = conv_after_body(forward_features(feat)) + feat
            feat = nn.Conv(num_feat, (3, 3), padding=1,
                           name='conv_before_upsample.0')(feat)
            feat = jax.nn.leaky_relu(feat, 0.01)
            feat = upsample_pixelshuffle(feat, self.upscale, num_feat,
                                         prefix='upsample')
            out = nn.Conv(self.in_chans, (3, 3), padding=1,
                          name='conv_last')(feat)
        elif self.upsampler == 'pixelshuffledirect':
            feat = nn.Conv(self.embed_dim, (3, 3), padding=1,
                           name='conv_first')(x)
            feat = conv_after_body(forward_features(feat)) + feat
            feat = nn.Conv(self.in_chans * self.upscale**2, (3, 3),
                           padding=1, name='upsample.0')(feat)
            out = pixel_shuffle(feat, self.upscale)
        elif self.upsampler == 'nearest+conv':
            assert self.upscale == 4, 'only support x4 now.'
            feat = nn.Conv(self.embed_dim, (3, 3), padding=1,
                           name='conv_first')(x)
            feat = conv_after_body(forward_features(feat)) + feat
            feat = nn.Conv(num_feat, (3, 3), padding=1,
                           name='conv_before_upsample.0')(feat)
            feat = jax.nn.leaky_relu(feat, 0.01)
            feat = jax.nn.leaky_relu(nn.Conv(
                num_feat, (3, 3), padding=1, name='conv_up1')(
                interpolate(feat, scale_factor=2, mode='nearest')), 0.2)
            feat = jax.nn.leaky_relu(nn.Conv(
                num_feat, (3, 3), padding=1, name='conv_up2')(
                interpolate(feat, scale_factor=2, mode='nearest')), 0.2)
            out = nn.Conv(self.in_chans, (3, 3), padding=1,
                          name='conv_last')(
                jax.nn.leaky_relu(nn.Conv(num_feat, (3, 3), padding=1,
                                          name='conv_hr')(feat), 0.2))
        else:
            feat_first = nn.Conv(self.embed_dim, (3, 3), padding=1,
                                 name='conv_first')(x)
            res = conv_after_body(forward_features(feat_first)) + \
                feat_first
            out = x + nn.Conv(self.in_chans, (3, 3), padding=1,
                              name='conv_last')(res)

        return out / self.img_range + mean


def swinir_rename(key):
    """torch->flax key adapter for SwinIR .pth files: drop the
    relative_position_index / attn_mask buffers (recomputed here)."""
    if key.endswith('relative_position_index') or \
            key.endswith('attn_mask'):
        return None
    return key
