"""Offline LPIPS over two folders
(reference scripts/metrics/calculate_lpips.py).

Runs NATIVELY on the framework's flax LPIPS (mrefsr_tpu/metrics/
lpips.py) given local paths to the official weight files; no external
``lpips`` package needed (the reference requires it).

Usage:
  python scripts/metrics/calculate_lpips.py --gt <dir> --restored <dir> \
      --lpips_weights vgg.pth --vgg16_weights vgg16-397923af.pth
"""
import argparse
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.metrics import calculate_lpips  # noqa: E402
from mrefsr_tpu.utils.misc import scandir  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--gt', type=str,
                        default='datasets/celeba/celeba_512_validation')
    parser.add_argument('--restored', type=str,
                        default='results/restored')
    parser.add_argument('--lpips_weights', type=str, required=True,
                        help='official LPIPS vgg.pth (lin heads)')
    parser.add_argument('--vgg16_weights', type=str, required=True,
                        help='torchvision vgg16 state dict')
    parser.add_argument('--suffix', type=str, default='',
                        help='suffix of restored filenames')
    args = parser.parse_args()

    img_list = sorted(scandir(args.gt, recursive=True, full_path=True))
    lpips_all = []
    for i, img_path in enumerate(img_list):
        basename, ext = osp.splitext(osp.basename(img_path))
        img_gt = cv2.imread(img_path, cv2.IMREAD_COLOR)
        img_restored = cv2.imread(
            osp.join(args.restored, basename + args.suffix + ext),
            cv2.IMREAD_COLOR)
        # pass the cv2 BGR images as-is: calculate_lpips's contract is
        # BGR input (like every registry metric) and it converts to RGB
        # internally — a pre-flip here would double-swap the channels
        val = calculate_lpips(
            img_gt.astype(np.float32),
            img_restored.astype(np.float32),
            crop_border=0,
            lpips_weights=args.lpips_weights,
            vgg16_weights=args.vgg16_weights)
        print(f'{i + 1:3d}: {basename:25}. \tLPIPS: {val:.6f}.')
        lpips_all.append(val)
    print(f'Average: LPIPS: {sum(lpips_all) / len(lpips_all):.6f}')


if __name__ == '__main__':
    main()
