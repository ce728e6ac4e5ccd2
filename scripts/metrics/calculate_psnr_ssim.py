"""Offline PSNR/SSIM over two image folders
(reference scripts/metrics/calculate_psnr_ssim.py)."""
import argparse
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.metrics import calculate_psnr, calculate_ssim  # noqa: E402
from mrefsr_tpu.utils import bgr2ycbcr  # noqa: E402
from mrefsr_tpu.utils.misc import scandir  # noqa: E402


def main(args):
    psnr_all, ssim_all = [], []
    img_list_gt = sorted(scandir(args.gt, recursive=True, full_path=True))
    img_list_restored = sorted(
        scandir(args.restored, recursive=True, full_path=True))

    print('Testing Y channel.' if args.test_y_channel
          else 'Testing RGB channels.')
    for i, img_path in enumerate(img_list_gt):
        basename, ext = osp.splitext(osp.basename(img_path))
        img_gt = cv2.imread(
            img_path, cv2.IMREAD_UNCHANGED).astype(np.float32) / 255.
        if args.suffix == '':
            img_path_restored = img_list_restored[i]
        else:
            img_path_restored = osp.join(args.restored,
                                         basename + args.suffix + ext)
        img_restored = cv2.imread(
            img_path_restored,
            cv2.IMREAD_UNCHANGED).astype(np.float32) / 255.

        if args.correct_mean_var:
            mean_l = [np.mean(img_gt[:, :, j]) for j in range(3)]
            std_l = [np.std(img_gt[:, :, j]) for j in range(3)]
            for j in range(3):
                for _ in range(2):  # correct twice, like the reference
                    mean = np.mean(img_restored[:, :, j])
                    img_restored[:, :, j] += mean_l[j] - mean
                    std = np.std(img_restored[:, :, j])
                    img_restored[:, :, j] *= std_l[j] / std

        if args.test_y_channel and img_gt.ndim == 3 \
                and img_gt.shape[2] == 3:
            img_gt = bgr2ycbcr(img_gt, y_only=True)
            img_restored = bgr2ycbcr(img_restored, y_only=True)

        psnr = calculate_psnr(img_gt * 255, img_restored * 255,
                              crop_border=args.crop_border,
                              input_order='HWC')
        ssim = calculate_ssim(img_gt * 255, img_restored * 255,
                              crop_border=args.crop_border,
                              input_order='HWC')
        print(f'{i + 1:3d}: {basename:25}. \tPSNR: {psnr:.6f} dB, '
              f'\tSSIM: {ssim:.6f}')
        psnr_all.append(psnr)
        ssim_all.append(ssim)
    print(args.gt)
    print(args.restored)
    print(f'Average: PSNR: {sum(psnr_all) / len(psnr_all):.6f} dB, '
          f'SSIM: {sum(ssim_all) / len(ssim_all):.6f}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--gt', type=str,
                        default='datasets/val_set14/Set14')
    parser.add_argument('--restored', type=str,
                        default='results/Set14')
    parser.add_argument('--crop_border', type=int, default=4)
    parser.add_argument('--suffix', type=str, default='')
    parser.add_argument('--test_y_channel', action='store_true')
    parser.add_argument('--correct_mean_var', action='store_true')
    main(parser.parse_args())
