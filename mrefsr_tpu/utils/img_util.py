"""Host image <-> device array conversion and image IO.

Rebuild of reference basicsr/utils/img_util.py with one deliberate layout
change: the framework is NHWC end-to-end (TPU-native), so ``img2tensor``
keeps HWC (no CHW transpose) and ``tensor2img`` accepts NHWC/HWC jax or
numpy arrays. The BGR<->RGB and uint8-rounding contracts are identical to
the reference (img2tensor:9-36, tensor2img:38-111, imfrombytes:114-133,
imwrite:135-153, crop_border:156-172).
"""
import math
import os

import cv2
import numpy as np


def img2tensor(imgs, bgr2rgb=True, float32=True):
    """Numpy HWC image(s) -> float32 HWC RGB numpy array(s).

    The result feeds jnp.asarray / device_put directly (NHWC batching).
    """

    def _totensor(img, bgr2rgb, float32):
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[2] == 3 and bgr2rgb:
            if img.dtype == np.float64:
                img = img.astype(np.float32)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if float32:
            img = img.astype(np.float32)
        return np.ascontiguousarray(img)

    if isinstance(imgs, list):
        return [_totensor(img, bgr2rgb, float32) for img in imgs]
    return _totensor(imgs, bgr2rgb, float32)


def tensor2img(tensor, rgb2bgr=True, out_type=np.uint8, min_max=(0, 1)):
    """Device array(s) -> uint8 BGR HWC numpy image(s).

    Accepts NHWC (batch of 1 squeezed), HWC, or HW arrays (jax or numpy),
    channel order RGB. Clamps to min_max, rescales to [0,1], rounds to
    uint8 — the same contract as the reference tensor2img.
    """
    single_input = not isinstance(tensor, list)
    if single_input:
        tensor = [tensor]
    result = []
    for t in tensor:
        arr = np.asarray(t, dtype=np.float32)
        if arr.ndim == 4:
            if arr.shape[0] == 1:
                arr = arr[0]
            else:
                # tile a batch into a square grid like torchvision make_grid
                arr = _make_grid(arr, nrow=int(math.sqrt(arr.shape[0])))
        arr = np.clip(arr, min_max[0], min_max[1])
        arr = (arr - min_max[0]) / (min_max[1] - min_max[0])

        if arr.ndim == 3:
            if arr.shape[2] == 1:  # gray
                arr = arr[:, :, 0]
            elif rgb2bgr:
                arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
        elif arr.ndim != 2:
            raise TypeError('Only support 4D, 3D or 2D arrays. '
                            f'Got dimension: {arr.ndim}')
        if out_type == np.uint8:
            arr = (arr * 255.0).round()
        result.append(arr.astype(out_type))
    if single_input:
        return result[0]
    return result


def _make_grid(batch, nrow, padding=2):
    """Minimal NHWC make_grid (uint-agnostic), enough for visualization."""
    n, h, w, c = batch.shape
    ncol = nrow
    nrow_ = math.ceil(n / ncol)
    grid = np.zeros((h * nrow_ + padding * (nrow_ - 1),
                     w * ncol + padding * (ncol - 1), c), batch.dtype)
    for idx in range(n):
        r, col = divmod(idx, ncol)
        grid[r * (h + padding):r * (h + padding) + h,
             col * (w + padding):col * (w + padding) + w] = batch[idx]
    return grid


def tensor2img_fast(tensor, rgb2bgr=True, min_max=(0, 1)):
    """Faster single-image variant of tensor2img (reference
    img_util.py:97-111): only (1, H, W, C) / (H, W, C) arrays, scales to
    [0, 255] and TRUNCATES to uint8 (the reference casts with
    ``.type(torch.uint8)``, which truncates rather than rounds)."""
    arr = np.asarray(tensor, dtype=np.float32)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip(arr, min_max[0], min_max[1])
    arr = (arr - min_max[0]) / (min_max[1] - min_max[0]) * 255
    arr = arr.astype(np.uint8)
    if rgb2bgr:
        arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
    return arr


def imfrombytes(content, flag='color', float32=False):
    """Read an image from bytes (reference img_util.py:114-133).

    Returns HWC BGR uint8 (or float32 [0,1] if requested).
    """
    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {
        'color': cv2.IMREAD_COLOR,
        'grayscale': cv2.IMREAD_GRAYSCALE,
        'unchanged': cv2.IMREAD_UNCHANGED
    }
    img = cv2.imdecode(img_np, imread_flags[flag])
    if float32:
        img = img.astype(np.float32) / 255.
    return img


def imwrite(img, file_path, params=None, auto_mkdir=True):
    """Write a BGR HWC image (reference img_util.py:135-153)."""
    if auto_mkdir:
        dir_name = os.path.abspath(os.path.dirname(file_path))
        os.makedirs(dir_name, exist_ok=True)
    ok = cv2.imwrite(file_path, img, params)
    if not ok:
        raise IOError('Failed in writing images.')


def crop_border(imgs, crop_border):
    """Crop borders of HWC image(s) (reference img_util.py:156-172)."""
    if crop_border == 0:
        return imgs
    if isinstance(imgs, list):
        return [
            v[crop_border:-crop_border, crop_border:-crop_border, ...]
            for v in imgs
        ]
    return imgs[crop_border:-crop_border, crop_border:-crop_border, ...]
