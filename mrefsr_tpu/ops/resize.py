"""Torch-compatible resize / pixel-shuffle primitives on NHWC arrays.

These replicate torch.nn.functional semantics used throughout the
reference archs (F.interpolate, nn.PixelShuffle, pixel_unshuffle at
basicsr/archs/arch_util.py:272) so converted checkpoints produce
identical activations. All functions are jit/grad-friendly.
"""
import jax
import jax.numpy as jnp


def interpolate(x, scale_factor=None, size=None, mode='bilinear',
                align_corners=False):
    """F.interpolate equivalent for NHWC inputs.

    align_corners=False maps to half-pixel-center resampling
    (jax.image.resize's convention); align_corners=True uses the exact
    corner-aligned source grid.
    """
    n, h, w, c = x.shape
    if size is None:
        out_h, out_w = int(h * scale_factor), int(w * scale_factor)
    else:
        out_h, out_w = size

    if mode == 'nearest':
        # torch 'nearest' (legacy): src = floor(dst * in/out)
        ys = jnp.clip((jnp.arange(out_h) * (h / out_h)).astype(jnp.int32),
                      0, h - 1)
        xs = jnp.clip((jnp.arange(out_w) * (w / out_w)).astype(jnp.int32),
                      0, w - 1)
        return x[:, ys][:, :, xs]

    if not align_corners:
        if mode == 'bicubic':
            # jax.image.resize's cubic kernel is Keys A=-0.5; torch's
            # F.interpolate uses A=-0.75 — build the exact torch
            # resampling matrices instead (shapes are static under jit)
            mh = jnp.asarray(resize_matrix_np(h, out_h, 'bicubic'),
                             x.dtype)
            mw = jnp.asarray(resize_matrix_np(w, out_w, 'bicubic'),
                             x.dtype)
            return apply_resize_matrices(x, mh, mw).astype(x.dtype)
        if mode != 'bilinear':
            raise NotImplementedError(f'interpolate mode {mode!r}')
        # antialias=False matches torch F.interpolate's plain (non-area)
        # kernel on downsampling as well as upsampling
        return jax.image.resize(x, (n, out_h, out_w, c),
                                method='bilinear', antialias=False)

    # align_corners=True: src = dst * (in-1)/(out-1)
    if mode == 'bicubic':
        mh = jnp.asarray(_resize_matrix_ac_bicubic(h, out_h), x.dtype)
        mw = jnp.asarray(_resize_matrix_ac_bicubic(w, out_w), x.dtype)
        return apply_resize_matrices(x, mh, mw).astype(x.dtype)
    if mode != 'bilinear':
        raise NotImplementedError(
            f'align_corners=True only implemented for bilinear/bicubic, '
            f'got {mode}')
    ys = jnp.linspace(0., h - 1., out_h)
    xs = jnp.linspace(0., w - 1., out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]

    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def pixel_shuffle(x, upscale_factor):
    """NHWC pixel shuffle with torch channel semantics:
    in channel index = c*r*r + i*r + j -> out (c, h*r+i, w*r+j)."""
    n, h, w, c = x.shape
    r = upscale_factor
    oc = c // (r * r)
    x = x.reshape(n, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, oc
    return x.reshape(n, h * r, w * r, oc)


def pixel_unshuffle(x, scale):
    """Inverse of pixel_shuffle (reference arch_util.py:272-289)."""
    n, h, w, c = x.shape
    r = scale
    oh, ow = h // r, w // r
    x = x.reshape(n, oh, r, ow, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, oh, ow, c, r, r
    return x.reshape(n, oh, ow, c * r * r)


# ------------------------------------------------------------------ #
# Separable resize-as-matmul: the TPU-native form of F.interpolate    #
# with a *traced-data* (not traced-shape) scale factor.               #
# ------------------------------------------------------------------ #
# The RealESRGAN degradation pipeline resizes by a random scale each
# step (reference realesrgan_model.py:89-97,121-128). Dynamic output
# shapes would force an XLA recompile per scale; instead the host
# builds small 1-D resampling matrices (torch F.interpolate-parity
# weights for area/bilinear/bicubic) and the device applies them as two
# dense matmuls onto a FIXED canvas — one compiled graph for every
# scale, and the resample rides the MXU.

def _cubic_torch(t):
    """Torch's cubic convolution kernel, A=-0.75."""
    import numpy as _np
    a = -0.75
    at = _np.abs(t)
    f = _np.where(
        at <= 1, ((a + 2) * at - (a + 3)) * at * at + 1,
        _np.where(at < 2, (((at - 5) * at + 8) * at - 4) * a, 0.))
    return f


def _resize_matrix_ac_bicubic(in_size, out_size):
    """(out_size, in_size) torch bicubic align_corners=True matrix:
    src = dst * (in-1)/(out-1), cubic kernel A=-0.75, border clamp."""
    import numpy as _np
    m = _np.zeros((out_size, in_size), _np.float32)
    src = _np.arange(out_size) * (in_size - 1) / max(out_size - 1, 1)
    i0 = _np.floor(src).astype(_np.int64)
    for tap in range(-1, 3):
        w = _cubic_torch(src - (i0 + tap))
        for i in range(out_size):
            m[i, _np.clip(i0[i] + tap, 0, in_size - 1)] += w[i]
    return m


def resize_matrix_np(in_size, out_size, mode):
    """(out_size, in_size) numpy matrix replicating torch
    F.interpolate(mode=...) along one dimension (align_corners=False).

    area == adaptive average pooling (integer bin boundaries);
    bilinear/bicubic use half-pixel centers with border clamping.
    """
    import numpy as _np
    m = _np.zeros((out_size, in_size), _np.float32)
    if mode == 'area':
        for i in range(out_size):
            start = (i * in_size) // out_size
            end = -((-(i + 1) * in_size) // out_size)  # ceil
            m[i, start:end] = 1.0 / (end - start)
        return m
    src = (_np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    if mode == 'bilinear':
        i0 = _np.floor(src).astype(_np.int64)
        w1 = src - i0
        for i in range(out_size):
            m[i, _np.clip(i0[i], 0, in_size - 1)] += 1 - w1[i]
            m[i, _np.clip(i0[i] + 1, 0, in_size - 1)] += w1[i]
        return m
    if mode == 'bicubic':
        i0 = _np.floor(src).astype(_np.int64)
        for tap in range(-1, 3):
            w = _cubic_torch(src - (i0 + tap))
            for i in range(out_size):
                m[i, _np.clip(i0[i] + tap, 0, in_size - 1)] += w[i]
        return m
    raise ValueError(f'Unknown resize mode {mode}')


def apply_resize_matrices(x, mat_h, mat_w):
    """Resize NHWC ``x`` with per-axis matrices: (Ch,H)@(H,W,..)@(W,Cw)."""
    x = jnp.einsum('oh,bhwc->bowc', mat_h, x)
    return jnp.einsum('ow,bhwc->bhoc', mat_w, x)
