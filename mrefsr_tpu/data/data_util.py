"""Dataset path-resolution & frame-index helpers.

Behavioral rebuild of reference basicsr/data/data_util.py (path list
construction for folder/lmdb/meta-info/annotation layouts, video frame
index generation, DUF gaussian downsampling).
"""
import os.path as osp

import cv2
import numpy as np

from mrefsr_tpu.utils import imfrombytes, img2tensor, scandir


def read_img_seq(path, require_mod_crop=False, scale=1,
                 return_imgname=False):
    """Read a frame sequence from a folder into a stacked (T,H,W,C)
    float32 RGB array (reference data_util.py:11-40)."""
    from mrefsr_tpu.data.transforms import mod_crop
    if isinstance(path, list):
        img_paths = path
    else:
        img_paths = sorted(scandir(path, full_path=True))
    imgs = [cv2.imread(v).astype(np.float32) / 255. for v in img_paths]
    if require_mod_crop:
        imgs = [mod_crop(img, scale) for img in imgs]
    imgs = img2tensor(imgs, bgr2rgb=True, float32=True)
    imgs = np.stack(imgs, axis=0)
    if return_imgname:
        imgnames = [osp.splitext(osp.basename(p))[0] for p in img_paths]
        return imgs, imgnames
    return imgs


def generate_frame_indices(crt_idx, max_frame_num, num_frames,
                           padding='reflection'):
    """Temporal neighbor indices with border padding
    (reference data_util.py:43-92)."""
    assert num_frames % 2 == 1, 'num_frames should be an odd number.'
    assert padding in ('replicate', 'reflection', 'reflection_circle',
                       'circle'), f'Wrong padding mode: {padding}.'
    max_frame_num = max_frame_num - 1  # start from 0
    num_pad = num_frames // 2

    indices = []
    for i in range(crt_idx - num_pad, crt_idx + num_pad + 1):
        if i < 0:
            if padding == 'replicate':
                pad_idx = 0
            elif padding == 'reflection':
                pad_idx = -i
            elif padding == 'reflection_circle':
                pad_idx = crt_idx + num_pad - i
            else:
                pad_idx = num_frames + i
        elif i > max_frame_num:
            if padding == 'replicate':
                pad_idx = max_frame_num
            elif padding == 'reflection':
                pad_idx = max_frame_num * 2 - i
            elif padding == 'reflection_circle':
                pad_idx = (crt_idx - num_pad) - (i - max_frame_num)
            else:
                pad_idx = i - num_frames
        else:
            pad_idx = i
        indices.append(pad_idx)
    return indices


def paired_paths_from_lmdb(folders, keys):
    """Paired lmdb keys from matching meta_info.txt files
    (reference data_util.py:95-151)."""
    assert len(folders) == 2, (
        'The len of folders should be 2 with [input_folder, gt_folder]. '
        f'But got {len(folders)}')
    assert len(keys) == 2, (
        f'The len of keys should be 2 with [input_key, gt_key]. '
        f'But got {len(keys)}')
    input_folder, gt_folder = folders
    input_key, gt_key = keys

    if not (input_folder.endswith('.lmdb')
            and gt_folder.endswith('.lmdb')):
        raise ValueError(
            f'{input_key} folder and {gt_key} folder should both in lmdb '
            f'formats. But received {input_key}: {input_folder}; '
            f'{gt_key}: {gt_folder}')
    with open(osp.join(input_folder, 'meta_info.txt')) as fin:
        input_lmdb_keys = [line.split('.')[0] for line in fin]
    with open(osp.join(gt_folder, 'meta_info.txt')) as fin:
        gt_lmdb_keys = [line.split('.')[0] for line in fin]
    if set(input_lmdb_keys) != set(gt_lmdb_keys):
        raise ValueError(f'Keys in {input_key}_folder and {gt_key}_folder '
                         'are different.')
    paths = []
    for lmdb_key in sorted(input_lmdb_keys):
        paths.append({f'{input_key}_path': lmdb_key,
                      f'{gt_key}_path': lmdb_key})
    return paths


def paired_paths_from_pack(pack_paths, keys):
    """Paired keys from two native .pack shards (the TPU-native lmdb
    replacement, native/packio.cpp) — the pack analogue of
    paired_paths_from_lmdb, read from each shard's key index."""
    assert len(pack_paths) == 2 and len(keys) == 2
    from mrefsr_tpu.data.packio import PackReader
    key_sets = []
    for p in pack_paths:
        reader = PackReader(str(p))
        key_sets.append(set(reader.keys()))
        reader.close()
    input_key, gt_key = keys
    if key_sets[0] != key_sets[1]:
        raise ValueError(f'Keys in the {input_key} and {gt_key} packs '
                         'are different.')
    return [{f'{input_key}_path': k, f'{gt_key}_path': k}
            for k in sorted(key_sets[0])]


def paired_paths_from_meta_info_file(folders, keys, meta_info_file,
                                     filename_tmpl):
    """Paired paths from a meta-info txt (reference data_util.py:154-195)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys

    with open(meta_info_file, 'r') as fin:
        gt_names = [line.strip().split(' ')[0] for line in fin]

    paths = []
    for gt_name in gt_names:
        basename, ext = osp.splitext(osp.basename(gt_name))
        input_name = f'{filename_tmpl.format(basename)}{ext}'
        input_path = osp.join(input_folder, input_name)
        gt_path = osp.join(gt_folder, gt_name)
        paths.append({f'{input_key}_path': input_path,
                      f'{gt_key}_path': gt_path})
    return paths


def paired_paths_from_ann_file(folders, keys, ann_file):
    """Paired paths from an annotation file listing gt paths
    (reference data_util.py:198-236)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys

    paths = []
    with open(ann_file, 'r') as fin:
        for line in fin:
            gt_name = line.strip().split(' ')[0]
            basename = osp.splitext(osp.basename(gt_name))[0]
            input_path = osp.join(input_folder, f'{basename}.png')
            gt_path = osp.join(gt_folder, gt_name)
            paths.append({f'{input_key}_path': input_path,
                          f'{gt_key}_path': gt_path})
    return paths


def paired_paths_from_folder(folders, keys, filename_tmpl):
    """Paired paths from two image folders
    (reference data_util.py:239-272)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys

    input_paths = list(scandir(input_folder))
    gt_paths = list(scandir(gt_folder))
    assert len(input_paths) == len(gt_paths), (
        f'{input_key} and {gt_key} datasets have different number of '
        f'images: {len(input_paths)}, {len(gt_paths)}.')
    paths = []
    for gt_path in gt_paths:
        basename, ext = osp.splitext(osp.basename(gt_path))
        input_name = f'{filename_tmpl.format(basename)}{ext}'
        input_path = osp.join(input_folder, input_name)
        assert input_name in input_paths, (
            f'{input_name} is not in {input_key}_paths.')
        gt_path = osp.join(gt_folder, gt_path)
        paths.append({f'{input_key}_path': input_path,
                      f'{gt_key}_path': gt_path})
    return paths


def paths_from_folder(folder):
    """All image paths in a folder (reference data_util.py:275-287)."""
    paths = list(scandir(folder))
    return [osp.join(folder, path) for path in paths]


def paths_from_lmdb(folder):
    """Keys from an lmdb meta_info.txt (reference data_util.py:290-303)."""
    if not folder.endswith('.lmdb'):
        raise ValueError(f'Folder {folder} should in lmdb format.')
    with open(osp.join(folder, 'meta_info.txt')) as fin:
        return [line.split('.')[0] for line in fin]


def generate_gaussian_kernel(kernel_size=13, sigma=1.6):
    """2-D gaussian kernel (reference data_util.py:306-321)."""
    from scipy import ndimage
    kernel = np.zeros((kernel_size, kernel_size))
    kernel[kernel_size // 2, kernel_size // 2] = 1
    return ndimage.gaussian_filter(kernel, sigma)


def duf_downsample(x, kernel_size=13, scale=4):
    """Gaussian-blur downsampling used by DUF
    (reference data_util.py:324-352). x: (T,H,W,C) or (H,W,C) numpy."""
    assert scale in (2, 3, 4), f'Only support scale (2, 3, 4), '\
        f'but got {scale}.'
    squeeze_flag = False
    if x.ndim == 3:
        x = x[None]
        squeeze_flag = True
    kernel = generate_gaussian_kernel(kernel_size, 0.4 * scale)

    import jax.numpy as jnp
    from jax import lax
    t, h, w, c = x.shape
    pad_w = kernel_size // 2
    xp = jnp.pad(jnp.asarray(x), ((0, 0), (pad_w, pad_w), (pad_w, pad_w),
                                  (0, 0)), mode='reflect')
    kern = jnp.asarray(kernel, xp.dtype)[:, :, None, None]
    kern = jnp.tile(kern, (1, 1, 1, c))
    out = lax.conv_general_dilated(
        xp, kern, window_strides=(scale, scale), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=c)
    out = np.asarray(out)
    if squeeze_flag:
        out = out[0]
    return out

def lazy_file_client(io_backend_opt):
    """Thread-safe FileClient construction: the reference pops 'type'
    from the opt dict in-place (basicsr datasets), which is only safe
    with process-based loader workers; our loader runs __getitem__ in
    threads sharing the dataset object, so mutate a copy instead."""
    from mrefsr_tpu.utils import FileClient
    opt = dict(io_backend_opt)
    return FileClient(opt.pop('type'), **opt)


_file_client_lock = None


def ensure_file_client(dataset):
    """Construct ``dataset.file_client`` exactly once across loader
    threads (double-checked lock): the bare
    ``if self.file_client is None: self.file_client = ...`` pattern let
    every first-batch worker thread build its own client, leaking the
    losers' lmdb environments / pack mmaps."""
    if dataset.file_client is None:
        global _file_client_lock
        if _file_client_lock is None:
            import threading
            _file_client_lock = threading.Lock()
        with _file_client_lock:
            if dataset.file_client is None:
                dataset.file_client = lazy_file_client(
                    dataset.io_backend_opt)
    return dataset.file_client


def match_point_crop(img, center_xy, gt_h, gt_w):
    """Crop a (gt_h, gt_w) window centered on an annotated match point,
    clamped inside the image. The reference slices raw CSV coordinates
    (multi_ref_dataset.py:82-86) — a point nearer than half the window
    to the top/left border silently produces a numpy-wrapped/empty
    crop; clamping is identical for interior points (the only case the
    curated annotations produce) and correct on the boundary. An image
    smaller than the window raises instead of silently returning an
    under-sized crop (which would crash np.stack or desync the gt/lq
    scale downstream). Odd window sizes take the full gt size (the
    reference's y-g//2:y+g//2 slice yields gt-1; only even sizes are
    exercised)."""
    h, w = img.shape[:2]
    if h < gt_h or w < gt_w:
        raise ValueError(
            f'match_point_crop: image ({h}x{w}) smaller than the crop '
            f'window ({gt_h}x{gt_w})')
    x, y = int(center_xy[0]), int(center_xy[1])
    y0 = min(max(y - gt_h // 2, 0), h - gt_h)
    x0 = min(max(x - gt_w // 2, 0), w - gt_w)
    return img[y0:y0 + gt_h, x0:x0 + gt_w]
