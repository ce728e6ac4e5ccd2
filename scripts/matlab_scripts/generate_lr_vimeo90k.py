"""Bicubic-downsampled LR generation for Vimeo90K — python port of the
reference's scripts/matlab_scripts/generate_LR_Vimeo90K.m, built on the
framework's MATLAB-bit-matching ``imresize`` (mrefsr_tpu/utils/
matlab_functions.py) so no MATLAB license is needed.

Walks ``<root>/sequences/*/*/*.png``, mod-crops to a multiple of the
scale, downscales 1/scale with antialiased bicubic, and writes the same
tree under ``<root>_matlabLRx<scale>`` (the .m's strrep naming,
reference :12, generalized so a renamed dataset root can never make the
output path collapse onto the input).

Usage:
  python scripts/matlab_scripts/generate_lr_vimeo90k.py \
      --root /datasets/vimeo90k/vimeo_septuplet [--scale 4]
"""
import argparse
import glob
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.utils import imresize  # noqa: E402


def modcrop(img, modulo):
    h, w = img.shape[:2]
    return img[:h - h % modulo, :w - w % modulo, ...]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--root', type=str, required=True,
                        help='vimeo_septuplet root (contains sequences/)')
    parser.add_argument('--scale', type=int, default=4)
    args = parser.parse_args()

    paths = sorted(glob.glob(osp.join(args.root, 'sequences', '*', '*',
                                      '*.png')))
    root = args.root.rstrip('/')
    out_root = f'{root}_matlabLRx{args.scale}'
    for idx, path in enumerate(paths, 1):
        save_path = out_root + path[len(root):]
        assert osp.abspath(save_path) != osp.abspath(path), save_path
        os.makedirs(osp.dirname(save_path), exist_ok=True)
        img = cv2.imread(path, cv2.IMREAD_COLOR).astype(np.float64) / 255.
        img = modcrop(img, args.scale)
        # MATLAB imresize 1/scale with antialiasing, im2double domain
        lr = np.asarray(imresize(img, 1 / args.scale))
        lr = np.clip(np.round(lr * 255.), 0, 255).astype(np.uint8)
        cv2.imwrite(save_path, lr)
        print(f'{idx}\t{osp.splitext(osp.basename(path))[0]}.')


if __name__ == '__main__':
    main()
