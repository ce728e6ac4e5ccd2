"""Offline LPIPS over two folders
(reference scripts/metrics/calculate_lpips.py). Requires the ``lpips``
package (torch); gated since this environment may not ship it."""
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.utils.misc import scandir  # noqa: E402

try:
    import lpips
    import torch
except ImportError:
    lpips = None


def main():
    if lpips is None:
        raise ImportError('Please install lpips: pip install lpips')
    loss_fn_vgg = lpips.LPIPS(net='vgg')
    mean = [0.5, 0.5, 0.5]
    std = [0.5, 0.5, 0.5]

    folder_gt = 'datasets/celeba/celeba_512_validation'
    folder_restored = 'results/restored'
    img_list = sorted(scandir(folder_gt, recursive=True, full_path=True))
    lpips_all = []
    for i, img_path in enumerate(img_list):
        basename, ext = osp.splitext(osp.basename(img_path))
        img_gt = cv2.imread(
            img_path, cv2.IMREAD_UNCHANGED).astype(np.float32) / 255.
        img_restored = cv2.imread(
            osp.join(folder_restored, basename + ext),
            cv2.IMREAD_UNCHANGED).astype(np.float32) / 255.

        def to_tensor(img):
            t = torch.from_numpy(
                img[:, :, ::-1].transpose(2, 0, 1).copy()).float()
            for c, (m, s) in enumerate(zip(mean, std)):
                t[c] = (t[c] - m) / s
            return t.unsqueeze(0)

        val = loss_fn_vgg(to_tensor(img_restored),
                          to_tensor(img_gt)).item()
        print(f'{i + 1:3d}: {basename:25}. \tLPIPS: {val:.6f}.')
        lpips_all.append(val)
    print(f'Average: LPIPS: {sum(lpips_all) / len(lpips_all):.6f}')


if __name__ == '__main__':
    main()
