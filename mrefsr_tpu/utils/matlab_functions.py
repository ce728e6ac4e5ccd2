"""MATLAB-faithful bicubic imresize (antialiased), vectorized numpy.

Behavioral rebuild of reference basicsr/utils/matlab_functions.py:6-178.
The reference runs a per-row torch ``mv`` loop on CPU; here each axis is a
single gather + einsum, which is both faster on host and expressible in
jnp for on-device use. Output matches the reference to float32 precision.
"""
import math

import numpy as np


def cubic(x):
    """Keys bicubic kernel, a = -0.5 (reference matlab_functions.py:6-13)."""
    absx = np.abs(x)
    absx2 = absx**2
    absx3 = absx**3
    return ((1.5 * absx3 - 2.5 * absx2 + 1) * (absx <= 1) +
            (-0.5 * absx3 + 2.5 * absx2 - 4 * absx + 2) *
            ((absx > 1) & (absx <= 2)))


def calculate_weights_indices(in_length, out_length, scale, kernel,
                              kernel_width, antialiasing):
    """Per-output-pixel contribution weights and source indices.

    Matches reference matlab_functions.py:16-83 including the MATLAB
    half-pixel mapping, antialias kernel widening, zero-column trimming,
    and symmetric-extension index offsets.

    Returns:
        (weights [out,p], indices [out,p] into the symmetric-padded axis,
         sym_len_start, sym_len_end)
    """
    if (scale < 1) and antialiasing:
        kernel_width = kernel_width / scale

    x = np.arange(1, out_length + 1, dtype=np.float64)
    # inverse mapping: 0.5 out-space -> 0.5 in-space
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = math.ceil(kernel_width) + 2

    indices = left[:, None] + np.arange(p)[None, :]
    distance_to_center = u[:, None] - indices

    if (scale < 1) and antialiasing:
        weights = scale * cubic(distance_to_center * scale)
    else:
        weights = cubic(distance_to_center)
    weights = weights / np.sum(weights, axis=1, keepdims=True)

    # trim all-zero first/last columns
    weights_zero_tmp = np.sum(weights == 0, axis=0)
    if not math.isclose(weights_zero_tmp[0], 0, rel_tol=1e-6):
        indices = indices[:, 1:p - 1]
        weights = weights[:, 1:p - 1]
    if not math.isclose(weights_zero_tmp[-1], 0, rel_tol=1e-6):
        indices = indices[:, 0:p - 2]
        weights = weights[:, 0:p - 2]

    sym_len_s = int(-indices.min() + 1)
    sym_len_e = int(indices.max() - in_length)
    indices = (indices + sym_len_s - 1).astype(np.int64)
    return weights.astype(np.float32), indices, sym_len_s, sym_len_e


def _sym_pad_axis0(img, sym_len_s, sym_len_e):
    """Symmetric (reflect-without-repeat... actually mirrored-with-edge)
    extension along axis 0, matching the reference's index_select flips
    (matlab_functions.py:131-141)."""
    head = img[:sym_len_s][::-1]
    tail = img[img.shape[0] - sym_len_e:][::-1]
    return np.concatenate([head, img, tail], axis=0)


def _resize_axis0(img, weights, indices, sym_len_s, sym_len_e):
    img_aug = _sym_pad_axis0(img, sym_len_s, sym_len_e)
    # gather [out, p, ...] then contract p against weights
    gathered = img_aug[indices]  # (out, p, W, C)
    return np.einsum('op,opwc->owc', weights, gathered, optimize=True)


def imresize(img, scale, antialiasing=True):
    """MATLAB-identical bicubic resize.

    Args:
        img: numpy (h, w, c) or (h, w), float [0,1] — or a torch-style
            (c, h, w) array is NOT accepted here; this rebuild standardizes
            on HWC numpy (the framework's host-side image layout).
        scale (float): same scale for both axes.
        antialiasing (bool): widen the kernel when downscaling.

    Returns:
        numpy (out_h, out_w, c) or (out_h, out_w) float32, range [0,1],
        un-rounded — same contract as reference matlab_functions.py:86-178.
    """
    squeeze_flag = False
    if img.ndim == 2:
        img = img[:, :, None]
        squeeze_flag = True
    img = np.asarray(img, dtype=np.float32)

    in_h, in_w = img.shape[:2]
    out_h, out_w = math.ceil(in_h * scale), math.ceil(in_w * scale)
    kernel_width = 4

    weights_h, indices_h, sym_len_hs, sym_len_he = calculate_weights_indices(
        in_h, out_h, scale, 'cubic', kernel_width, antialiasing)
    weights_w, indices_w, sym_len_ws, sym_len_we = calculate_weights_indices(
        in_w, out_w, scale, 'cubic', kernel_width, antialiasing)

    out = _resize_axis0(img, weights_h, indices_h, sym_len_hs, sym_len_he)
    out = out.transpose(1, 0, 2)  # (W, out_h, C)
    out = _resize_axis0(out, weights_w, indices_w, sym_len_ws, sym_len_we)
    out = out.transpose(1, 0, 2)  # (out_h, out_w, C)

    if squeeze_flag:
        out = out[:, :, 0]
    return out.astype(np.float32)
