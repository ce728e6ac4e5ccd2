"""Differentiable JPEG, jnp/NHWC (reference basicsr/utils/diffjpeg.py).

The reference composes ~14 small nn.Modules (RGB2YCbCrJpeg,
ChromaSubsampling, BlockSplitting, DCT8x8, quantize/dequantize, iDCT8x8,
BlockMerging, ChromaUpsampling, YCbCr2RGBJpeg) around torch tensordots.
Here the whole codec is a handful of pure functions on NHWC arrays: the
8x8 (i)DCT is one tensordot against a baked (8,8,8,8) basis — a single
MXU matmul per plane — and everything else is reshapes/elementwise, all
of which XLA fuses. Fully jit-traceable with per-sample quality factors,
so RealESRGAN's on-device JPEG stage stays inside the train step.
"""
import itertools

import jax.numpy as jnp
import numpy as np

# luma / chroma quantization tables (reference diffjpeg.py:14-24; note the
# reference stores both transposed)
Y_TABLE = np.array(
    [[16, 11, 10, 16, 24, 40, 51, 61], [12, 12, 14, 19, 26, 58, 60, 55],
     [14, 13, 16, 24, 40, 57, 69, 56], [14, 17, 22, 29, 51, 87, 80, 62],
     [18, 22, 37, 56, 68, 109, 103, 77], [24, 35, 55, 64, 81, 104, 113, 92],
     [49, 64, 78, 87, 103, 121, 120, 101],
     [72, 92, 95, 98, 112, 100, 103, 99]],
    dtype=np.float32).T
C_TABLE = np.full((8, 8), 99, dtype=np.float32)
C_TABLE[:4, :4] = np.array([[17, 18, 24, 47], [18, 21, 26, 66],
                            [24, 26, 56, 99], [47, 66, 99, 99]]).T

_DCT = np.zeros((8, 8, 8, 8), dtype=np.float32)
for _x, _y, _u, _v in itertools.product(range(8), repeat=4):
    _DCT[_x, _y, _u, _v] = (np.cos((2 * _x + 1) * _u * np.pi / 16) *
                            np.cos((2 * _y + 1) * _v * np.pi / 16))
_ALPHA = np.outer(np.array([1. / np.sqrt(2)] + [1] * 7),
                  np.array([1. / np.sqrt(2)] + [1] * 7)).astype(np.float32)

_RGB2YCBCR = np.array([[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5],
                       [0.5, -0.418688, -0.081312]], dtype=np.float32).T
_YCBCR2RGB = np.array([[1., 0., 1.402], [1, -0.344136, -0.714136],
                       [1, 1.772, 0]], dtype=np.float32).T


def diff_round(x):
    """Differentiable rounding (reference diffjpeg.py:26-29)."""
    return jnp.round(x) + (x - jnp.round(x))**3


def quality_to_factor(quality):
    """Quality in (0,100] -> compression factor; traceable
    (reference diffjpeg.py:32-45 branches per scalar)."""
    quality = jnp.asarray(quality, jnp.float32)
    return jnp.where(quality < 50, 5000. / quality,
                     200. - quality * 2) / 100.


def _block_split(plane):
    """(b, h, w) -> (b, h*w/64, 8, 8) (reference :98-118)."""
    b, h, w = plane.shape
    x = plane.reshape(b, h // 8, 8, w // 8, 8)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, -1, 8, 8)


def _block_merge(patches, height, width):
    """(b, h*w/64, 8, 8) -> (b, h, w) (reference :324-344)."""
    b = patches.shape[0]
    x = patches.reshape(b, height // 8, width // 8, 8, 8)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, height, width)


def _dct8x8(blocks):
    """(reference :121-145)"""
    return 0.25 * _ALPHA * jnp.tensordot(blocks - 128, jnp.asarray(_DCT),
                                         axes=2)


def _idct8x8(blocks):
    """(reference :297-321)"""
    return 0.25 * jnp.tensordot(blocks * _ALPHA, jnp.asarray(_DCT),
                                axes=[[-2, -1], [2, 3]]) + 128


def _factor_bc(factor, b):
    factor = jnp.asarray(factor, jnp.float32)
    if factor.ndim == 0:
        factor = jnp.broadcast_to(factor, (b,))
    return factor.reshape(b, 1, 1, 1)


def compress_jpeg(x, factor, rounding):
    """RGB NHWC [0,1] -> quantized (y, cb, cr) DCT blocks
    (reference CompressJpeg :208-245)."""
    b = x.shape[0]
    fb = _factor_bc(factor, b)
    ycbcr = jnp.tensordot(x * 255., jnp.asarray(_RGB2YCBCR), axes=1) \
        + jnp.asarray([0., 128., 128.])
    y = ycbcr[..., 0]
    # 2x2 mean-pool chroma (reference ChromaSubsampling :73-94)
    cb = ycbcr[..., 1].reshape(b, y.shape[1] // 2, 2, y.shape[2] // 2,
                               2).mean(axis=(2, 4))
    cr = ycbcr[..., 2].reshape(b, y.shape[1] // 2, 2, y.shape[2] // 2,
                               2).mean(axis=(2, 4))
    out = []
    for comp, table in ((y, Y_TABLE), (cb, C_TABLE), (cr, C_TABLE)):
        blocks = _dct8x8(_block_split(comp))
        out.append(rounding(blocks / (jnp.asarray(table) * fb)))
    return tuple(out)


def decompress_jpeg(y, cb, cr, imgh, imgw, factor):
    """Quantized blocks -> RGB NHWC [0,1] (reference DeCompressJpeg
    :401-446)."""
    b = y.shape[0]
    fb = _factor_bc(factor, b)
    planes = {}
    for name, comp, table, (hh, ww) in (
            ('y', y, Y_TABLE, (imgh, imgw)),
            ('cb', cb, C_TABLE, (imgh // 2, imgw // 2)),
            ('cr', cr, C_TABLE, (imgh // 2, imgw // 2))):
        deq = comp * (jnp.asarray(table) * fb)
        planes[name] = _block_merge(_idct8x8(deq), hh, ww)
    # nearest 2x chroma upsample (reference ChromaUpsampling :348-375)
    cb_up = jnp.repeat(jnp.repeat(planes['cb'], 2, axis=1), 2, axis=2)
    cr_up = jnp.repeat(jnp.repeat(planes['cr'], 2, axis=1), 2, axis=2)
    ycbcr = jnp.stack([planes['y'], cb_up, cr_up], axis=-1)
    rgb = jnp.tensordot(ycbcr + jnp.asarray([0., -128., -128.]),
                        jnp.asarray(_YCBCR2RGB), axes=1)
    return jnp.clip(rgb, 0., 255.) / 255.


class DiffJPEG:
    """Batched differentiable JPEG round-trip (reference DiffJPEG
    :449-478). Input NHWC RGB [0,1]; ``quality`` is a scalar or (b,)
    array of JPEG qualities."""

    def __init__(self, differentiable=True):
        self.rounding = diff_round if differentiable else jnp.round

    def __call__(self, x, quality):
        factor = quality_to_factor(quality)
        b, h, w, _ = x.shape
        h_pad = (16 - h % 16) % 16
        w_pad = (16 - w % 16) % 16
        x = jnp.pad(x, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
        y, cb, cr = compress_jpeg(x, factor, self.rounding)
        recovered = decompress_jpeg(y, cb, cr, h + h_pad, w + w_pad, factor)
        return recovered[:, :h, :w, :]
