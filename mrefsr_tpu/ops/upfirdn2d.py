"""upfirdn2d: upsample -> pad -> FIR filter -> downsample in one XLA conv.

The reference ships a CUDA kernel (basicsr/ops/upfirdn2d/
upfirdn2d_kernel.cu, wrapper upfirdn2d.py:153-192) for StyleGAN2
resampling. On TPU this is exactly one ``lax.conv_general_dilated``:
lhs_dilation implements the zero-stuffing upsample, window_strides the
downsample, and explicit padding the crop/pad — XLA fuses it natively.
"""
import jax.numpy as jnp
from jax import lax


def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """NHWC up-FIR-down (matches the reference's NCHW semantics per
    channel).

    Args:
        x: (N, H, W, C).
        kernel: (kh, kw) FIR filter (not flipped; correlation like the
            reference's native path).
        up: integer upsampling factor.
        down: integer downsampling factor.
        pad: (pad0, pad1) applied to both spatial dims (before leading
            edge / after trailing edge).
    """
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    kernel = jnp.asarray(kernel, x.dtype)
    # The reference applies correlation with the flipped kernel via F.conv2d
    # (true convolution after its explicit flip); conv_general_dilated is
    # correlation, so flip here to match.
    kern = jnp.flip(kernel, (0, 1))[:, :, None, None]  # HWIO, depthwise
    kern = jnp.tile(kern, (1, 1, 1, c))

    pad0, pad1 = pad
    # the CUDA op zero-stuffs to h*up (up-1 zeros also AFTER the last
    # sample); lhs_dilation gives h*up-(up-1), so extend the trailing pad
    out = lax.conv_general_dilated(
        x, kern,
        window_strides=(down, down),
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=c)
    return out
