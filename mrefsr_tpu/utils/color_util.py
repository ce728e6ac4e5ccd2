"""BT.601 color conversions matching MATLAB rgb2ycbcr/ycbcr2rgb.

Rebuild of reference basicsr/utils/color_util.py. The numpy functions are
bit-compatible with the reference (uint8 round / float32 [0,1] contract);
``rgb2ycbcr_jax`` is the device-side batched variant replacing
``rgb2ycbcr_pt`` (color_util.py:186-208), operating on NHWC jax arrays.
"""
import numpy as np

# MATLAB BT.601 RGB->YCbCr matrix, applied to [0,1] inputs, yields [0,255].
_RGB2YCBCR_W = np.array([[65.481, -37.797, 112.0],
                         [128.553, -74.203, -93.786],
                         [24.966, 112.0, -18.214]])
_YCBCR_BIAS = np.array([16.0, 128.0, 128.0])


def _convert_input_type_range(img):
    """To float32 [0,1] (reference color_util.py:129-152)."""
    img_type = img.dtype
    img = img.astype(np.float32)
    if img_type == np.float32:
        pass
    elif img_type == np.uint8:
        img /= 255.
    else:
        raise TypeError('The img type should be np.float32 or np.uint8, '
                        f'but got {img_type}')
    return img


def _convert_output_type_range(img, dst_type):
    """From float32 [0,255] to dst_type (reference color_util.py:155-183)."""
    if dst_type not in (np.uint8, np.float32):
        raise TypeError('The dst_type should be np.float32 or np.uint8, '
                        f'but got {dst_type}')
    if dst_type == np.uint8:
        img = img.round()
    else:
        img /= 255.
    return img.astype(dst_type)


def rgb2ycbcr(img, y_only=False):
    """MATLAB-compatible RGB -> YCbCr (reference color_util.py:5-36)."""
    img_type = img.dtype
    img = _convert_input_type_range(img)
    if y_only:
        out_img = np.dot(img, _RGB2YCBCR_W[:, 0]) + 16.0
    else:
        out_img = np.matmul(img, _RGB2YCBCR_W) + _YCBCR_BIAS
    return _convert_output_type_range(out_img, img_type)


def bgr2ycbcr(img, y_only=False):
    """MATLAB-compatible BGR -> YCbCr (reference color_util.py:39-70)."""
    img_type = img.dtype
    img = _convert_input_type_range(img)
    w = _RGB2YCBCR_W[::-1]  # BGR channel order
    if y_only:
        out_img = np.dot(img, w[:, 0]) + 16.0
    else:
        out_img = np.matmul(img, w) + _YCBCR_BIAS
    return _convert_output_type_range(out_img, img_type)


def ycbcr2rgb(img):
    """MATLAB-compatible YCbCr -> RGB (reference color_util.py:73-99)."""
    img_type = img.dtype
    img = _convert_input_type_range(img) * 255
    out_img = np.matmul(img, [[0.00456621, 0.00456621, 0.00456621],
                              [0, -0.00153632, 0.00791071],
                              [0.00625893, -0.00318811, 0]]) * 255.0 + \
        [-222.921, 135.576, -276.836]
    return _convert_output_type_range(out_img, img_type)


def ycbcr2bgr(img):
    """MATLAB-compatible YCbCr -> BGR (reference color_util.py:102-126)."""
    img_type = img.dtype
    img = _convert_input_type_range(img) * 255
    out_img = np.matmul(img, [[0.00456621, 0.00456621, 0.00456621],
                              [0.00791071, -0.00153632, 0],
                              [0, -0.00318811, 0.00625893]]) * 255.0 + \
        [-276.836, 135.576, -222.921]
    return _convert_output_type_range(out_img, img_type)


def rgb2ycbcr_jax(img, y_only=False):
    """Device-side RGB -> YCbCr on NHWC [0,1] arrays.

    Replaces reference ``rgb2ycbcr_pt`` (color_util.py:186-208); output is
    in [0,1] like the reference's.
    """
    import jax.numpy as jnp
    w = jnp.asarray(_RGB2YCBCR_W, dtype=img.dtype)
    if y_only:
        out = img @ w[:, :1] + 16.0
    else:
        out = img @ w + jnp.asarray(_YCBCR_BIAS, dtype=img.dtype)
    return out / 255.


def rgb2ycbcr_pt(img, y_only=False):
    """True drop-in for the reference's ``rgb2ycbcr_pt``
    (color_util.py:186-208): takes (n, 3, h, w) in [0, 1] and returns
    the same channel-first layout, so code ported from the reference
    keeps its shapes. The TPU-native NHWC variant is
    :func:`rgb2ycbcr_jax` — prefer it in new code (channel-last is the
    framework-wide layout)."""
    import jax.numpy as jnp
    out = rgb2ycbcr_jax(jnp.moveaxis(img, 1, -1), y_only=y_only)
    return jnp.moveaxis(out, -1, 1)
