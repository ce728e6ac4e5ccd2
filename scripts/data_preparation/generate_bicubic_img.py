"""MATLAB-faithful bicubic LR/bicubic-upsampled image generation — the
python equivalent of the reference's
scripts/matlab_scripts/generate_bicubic_img.m, built on the framework's
bit-matching `imresize` so no MATLAB license is needed."""
import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.utils import imresize  # noqa: E402
from mrefsr_tpu.utils.misc import scandir  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--input', type=str, required=True,
                        help='HR image folder')
    parser.add_argument('--output_lr', type=str, required=True)
    parser.add_argument('--output_bic', type=str, default=None,
                        help='optional bicubic-upsampled output folder')
    parser.add_argument('--scale', type=int, default=4)
    args = parser.parse_args()

    os.makedirs(args.output_lr, exist_ok=True)
    if args.output_bic:
        os.makedirs(args.output_bic, exist_ok=True)

    for path in sorted(scandir(args.input, full_path=True)):
        name = osp.basename(path)
        img = cv2.imread(path).astype(np.float64) / 255.
        h, w = img.shape[:2]
        img = img[:h - h % args.scale, :w - w % args.scale]
        lr = np.asarray(imresize(img, scale=1 / args.scale,
                                 antialiasing=True))
        cv2.imwrite(osp.join(args.output_lr, name),
                    (np.clip(lr, 0, 1) * 255).round().astype(np.uint8))
        if args.output_bic:
            bic = np.asarray(imresize(lr, scale=args.scale,
                                      antialiasing=True))
            cv2.imwrite(
                osp.join(args.output_bic, name),
                (np.clip(bic, 0, 1) * 255).round().astype(np.uint8))
        print('Processed', name)


if __name__ == '__main__':
    main()
