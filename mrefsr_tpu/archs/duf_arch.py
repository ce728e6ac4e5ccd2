"""DUF: dynamic upsampling filters video SR, flax / (N,T,H,W,C).

Rebuild of reference basicsr/archs/duf_arch.py
(DenseBlocksTemporalReduce:9, DenseBlocks:80, DynamicUpsamplingFilter:137,
DUF:188). 3-D convs run on NTHWC (time = depth axis) so XLA maps them to
MXU convolutions; the dynamic filtering is a per-pixel einsum instead of
the reference's im2col conv + matmul.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from mrefsr_tpu.ops import pixel_shuffle
from mrefsr_tpu.utils.registry import ARCH_REGISTRY


def _bn(name, train, eps):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=eps, name=name)


def _conv3d(feat, ksize, name):
    """Conv3d on NTHWC. ksize is (kt, kh, kw) with torch-style 'same'
    padding per axis."""
    pad = tuple((k // 2, k // 2) for k in ksize)
    return nn.Conv(feat, ksize, padding=pad, name=name)


class DenseBlocks(nn.Module):
    """N dense blocks growing channels by num_grow_ch each
    (reference duf_arch.py:80-134). Children named
    dense_blocks.{i}.{seq} to mirror the torch ModuleList of
    Sequentials (BN 0, Conv 2, BN 3, Conv 5)."""
    num_block: int
    num_feat: int = 64
    num_grow_ch: int = 16
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(self.num_block):
            ch = self.num_feat + i * self.num_grow_ch
            y = _bn(f'dense_blocks.{i}.0', train, self.eps)(x)
            y = nn.relu(y)
            y = _conv3d(ch, (1, 1, 1), f'dense_blocks.{i}.2')(y)
            y = _bn(f'dense_blocks.{i}.3', train, self.eps)(y)
            y = nn.relu(y)
            y = _conv3d(self.num_grow_ch, (3, 3, 3),
                        f'dense_blocks.{i}.5')(y)
            x = jnp.concatenate([x, y], axis=-1)
        return x


class DenseBlocksTemporalReduce(nn.Module):
    """3 dense blocks each shrinking T by 2 (reference duf_arch.py:9-77).
    Children temporal_reduce{1,2,3}.{seq}."""
    num_feat: int = 64
    num_grow_ch: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=False):
        for j in (1, 2, 3):
            ch = self.num_feat + (j - 1) * self.num_grow_ch
            y = _bn(f'temporal_reduce{j}.0', train, self.eps)(x)
            y = nn.relu(y)
            y = _conv3d(ch, (1, 1, 1), f'temporal_reduce{j}.2')(y)
            y = _bn(f'temporal_reduce{j}.3', train, self.eps)(y)
            y = nn.relu(y)
            # (3,3,3) conv valid in T, same in H/W (padding (0,1,1))
            y = nn.Conv(self.num_grow_ch, (3, 3, 3),
                        padding=((0, 0), (1, 1), (1, 1)),
                        name=f'temporal_reduce{j}.5')(y)
            x = jnp.concatenate([x[:, 1:-1], y], axis=-1)
        return x


def _extract_patches_5x5(x):
    """(n, h, w, c) -> (n, h, w, c, 25) zero-padded 5x5 neighborhoods in
    the reference's filter order f = fi*5 + fj
    (reference duf_arch.py:137-183: eye-expansion conv = shifted
    copies)."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    taps = [xp[:, fi:fi + h, fj:fj + w] for fi in range(5)
            for fj in range(5)]
    return jnp.stack(taps, axis=-1)


def dynamic_upsampling_filter(x, filters):
    """Apply per-pixel dynamic filters (reference duf_arch.py:160-183).

    Args:
        x: (n, h, w, 3) center frame.
        filters: (n, h, w, 25, r2) softmaxed filter bank.

    Returns:
        (n, h, w, 3*r2) with channel order c*r2 + u, matching the torch
        view(n, 3*r2, h, w) layout for pixel_shuffle.
    """
    patches = _extract_patches_5x5(x)  # (n,h,w,3,25)
    out = jnp.einsum('nhwcf,nhwfu->nhwcu', patches, filters)
    n, h, w = out.shape[:3]
    return out.reshape(n, h, w, -1)


@ARCH_REGISTRY.register()
class DUF(nn.Module):
    """DUF video SR (reference duf_arch.py:188-282).

    Call: x (N, 7, H, W, 3); returns (N, H*scale, W*scale, 3).
    """
    scale: int = 4
    num_layer: int = 52
    adapt_official_weights: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        eps = 1e-3 if self.adapt_official_weights else 1e-5
        if self.num_layer == 16:
            num_block, num_grow_ch = 3, 32
        elif self.num_layer == 28:
            num_block, num_grow_ch = 9, 16
        elif self.num_layer == 52:
            num_block, num_grow_ch = 21, 16
        else:
            raise ValueError(
                f'Only supported (16, 28, 52) layers, got {self.num_layer}.')

        num_imgs = x.shape[1]
        x_center = x[:, num_imgs // 2]

        x = _conv3d(64, (1, 3, 3), 'conv3d1')(x)
        x = DenseBlocks(num_block, 64, num_grow_ch, eps=eps,
                        name='dense_block1')(x, train=train)
        x = DenseBlocksTemporalReduce(64 + num_grow_ch * num_block,
                                      num_grow_ch, eps=eps,
                                      name='dense_block2')(x, train=train)
        x = nn.relu(_bn('bn3d2', train, eps)(x))
        x = nn.relu(_conv3d(256, (1, 3, 3), 'conv3d2')(x))

        res = _conv3d(256, (1, 1, 1), 'conv3d_r1')(x)
        res = _conv3d(3 * self.scale ** 2, (1, 1, 1),
                      'conv3d_r2')(nn.relu(res))

        filt = _conv3d(512, (1, 1, 1), 'conv3d_f1')(x)
        filt = _conv3d(25 * self.scale ** 2, (1, 1, 1),
                       'conv3d_f2')(nn.relu(filt))
        n, _, h, w, _ = filt.shape
        # torch channel layout is (25, r2) row-major
        filt = filt[:, 0].reshape(n, h, w, 25, self.scale ** 2)
        filt = jax.nn.softmax(filt, axis=3)

        out = dynamic_upsampling_filter(x_center, filt)
        out = out + res[:, 0]
        return pixel_shuffle(out, self.scale)
