"""Generate HiFaceGAN degraded training pairs
(reference scripts/data_preparation/prepare_hifacegan_dataset.py):
16x mosaic / blur / noise / JPEG degradations over a face folder."""
import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.data.degradations import (  # noqa: E402
    add_jpg_compression, random_add_gaussian_noise)
from mrefsr_tpu.utils.misc import scandir  # noqa: E402


def mosaic16x(x):
    """Replace each 16x16 block by its mean (reference :12-23)."""
    h, w = x.shape[:2]
    x = x.astype('float')
    for i in range((h + 15) // 16):
        for j in range((w + 15) // 16):
            block = x[i * 16:(i + 1) * 16, j * 16:(j + 1) * 16]
            x[i * 16:(i + 1) * 16, j * 16:(j + 1) * 16] = block.mean(
                axis=(0, 1))
    return x.astype('uint8')


def degrade(img, mode):
    if mode == 'mosaic':
        return mosaic16x(img)
    if mode == 'blur':
        return cv2.GaussianBlur(img, (0, 0), sigmaX=np.random.uniform(
            2, 5))
    if mode == 'noise':
        out = random_add_gaussian_noise(
            img.astype(np.float32) / 255., sigma_range=(10, 50))
        return (out * 255).round().astype(np.uint8)
    if mode == 'jpeg':
        out = add_jpg_compression(img.astype(np.float32) / 255.,
                                  quality=np.random.uniform(10, 40))
        return (out * 255).round().astype(np.uint8)
    raise ValueError(mode)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--input', type=str, required=True)
    parser.add_argument('--output', type=str, required=True)
    parser.add_argument('--mode', type=str, default='mosaic',
                        choices=['mosaic', 'blur', 'noise', 'jpeg'])
    args = parser.parse_args()
    os.makedirs(args.output, exist_ok=True)
    for path in sorted(scandir(args.input, full_path=True)):
        img = cv2.imread(path)
        out = degrade(img, args.mode)
        cv2.imwrite(osp.join(args.output, osp.basename(path)), out)
        print('Processed', osp.basename(path))


if __name__ == '__main__':
    main()
