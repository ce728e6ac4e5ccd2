"""Offline NIQE over a folder
(reference scripts/metrics/calculate_niqe.py)."""
import argparse
import os.path as osp
import sys
import warnings

import cv2

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.metrics import calculate_niqe  # noqa: E402
from mrefsr_tpu.utils.misc import scandir  # noqa: E402


def main(args):
    niqe_all = []
    img_list = sorted(scandir(args.input, recursive=True, full_path=True))
    for i, img_path in enumerate(img_list):
        basename, _ = osp.splitext(osp.basename(img_path))
        img = cv2.imread(img_path, cv2.IMREAD_UNCHANGED)
        with warnings.catch_warnings():
            warnings.simplefilter('ignore', category=RuntimeWarning)
            niqe_score = calculate_niqe(img, args.crop_border,
                                        input_order='HWC', convert_to='y')
        print(f'{i + 1:3d}: {basename:25}. \tNIQE: {niqe_score:.6f}')
        niqe_all.append(niqe_score)
    print(args.input)
    print(f'Average: NIQE: {sum(niqe_all) / len(niqe_all):.6f}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--input', type=str, default='datasets/val_set14/Set14')
    parser.add_argument('--crop_border', type=int, default=0)
    main(parser.parse_args())
