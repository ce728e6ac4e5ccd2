"""Iterative back-projection refinement — python port of the
reference's MATLAB scripts (scripts/matlab_scripts/backprojection.m,
main_bp.m, main_reverse_filter.m), built on the MATLAB-faithful
imresize so no MATLAB license is needed."""
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


def backprojection(sr, lr, iters=20):
    """sr <- sr + up(lr - down(sr)) for `iters` rounds
    (backprojection.m)."""
    scale = sr.shape[0] / lr.shape[0]
    for _ in range(iters):
        down = np.asarray(imresize(sr, scale=1 / scale,
                                   antialiasing=True))
        err = lr - down
        sr = sr + np.asarray(imresize(err, scale=scale,
                                      antialiasing=True))
    return sr


def reverse_filter(sr, lr, iters=20):
    """x_{k+1} = x_k + (sr - down_up(x_k)) (main_reverse_filter.m)."""
    scale = sr.shape[0] / lr.shape[0]
    x = sr.copy()
    for _ in range(iters):
        down = np.asarray(imresize(x, scale=1 / scale, antialiasing=True))
        up = np.asarray(imresize(down, scale=scale, antialiasing=True))
        x = x + (sr - up)
    return x


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--sr', type=str, required=True,
                        help='SR results folder')
    parser.add_argument('--lr', type=str, required=True,
                        help='LR inputs folder')
    parser.add_argument('--output', type=str, required=True)
    parser.add_argument('--iters', type=int, default=20)
    parser.add_argument('--mode', type=str, default='bp',
                        choices=['bp', 'reverse'])
    args = parser.parse_args()
    os.makedirs(args.output, exist_ok=True)

    lr_files = {osp.splitext(osp.basename(p))[0]: p
                for p in scandir(args.lr, full_path=True)}
    for sr_path in sorted(scandir(args.sr, full_path=True)):
        name = osp.splitext(osp.basename(sr_path))[0]
        base = name.split('_')[0]
        lr_path = lr_files.get(name) or lr_files.get(base)
        if lr_path is None:
            print('no LR match for', name, '- skipped')
            continue
        sr = cv2.imread(sr_path).astype(np.float64) / 255.
        lr = cv2.imread(lr_path).astype(np.float64) / 255.
        fn = backprojection if args.mode == 'bp' else reverse_filter
        out = fn(sr, lr, args.iters)
        cv2.imwrite(osp.join(args.output, osp.basename(sr_path)),
                    (np.clip(out, 0, 1) * 255).round().astype(np.uint8))
        print('Processed', name)


if __name__ == '__main__':
    main()
