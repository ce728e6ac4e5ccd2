"""Multi-process sub-image extraction for faster training IO
(reference scripts/data_preparation/extract_subimages.py)."""
import os
import os.path as osp
import sys
from multiprocessing import Pool

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.utils.misc import scandir  # noqa: E402


def main():
    """Crop large DIV2K-style images into overlapping sub-images. Edit
    the opt dicts below per folder, as in the reference."""
    opt = {'n_thread': 20, 'compression_level': 3}

    configs = [
        ('datasets/DIV2K/DIV2K_train_HR',
         'datasets/DIV2K/DIV2K_train_HR_sub', 480, 240),
        ('datasets/DIV2K/DIV2K_train_LR_bicubic/X2',
         'datasets/DIV2K/DIV2K_train_LR_bicubic/X2_sub', 240, 120),
        ('datasets/DIV2K/DIV2K_train_LR_bicubic/X3',
         'datasets/DIV2K/DIV2K_train_LR_bicubic/X3_sub', 160, 80),
        ('datasets/DIV2K/DIV2K_train_LR_bicubic/X4',
         'datasets/DIV2K/DIV2K_train_LR_bicubic/X4_sub', 120, 60),
    ]
    for input_folder, save_folder, crop_size, step in configs:
        opt.update(input_folder=input_folder, save_folder=save_folder,
                   crop_size=crop_size, step=step, thresh_size=0)
        extract_subimages(opt)


def extract_subimages(opt):
    input_folder = opt['input_folder']
    save_folder = opt['save_folder']
    if not osp.exists(save_folder):
        os.makedirs(save_folder)
        print(f'mkdir {save_folder} ...')
    else:
        print(f'Folder {save_folder} already exists. Exit.')
        sys.exit(1)

    img_list = list(scandir(input_folder, full_path=True))
    pool = Pool(opt['n_thread'])
    for path in img_list:
        pool.apply_async(worker, args=(path, opt),
                         callback=lambda p: print(f'Processed {p}'))
    pool.close()
    pool.join()
    print('All processes done.')


def worker(path, opt):
    """Sliding-window crop of one image (reference :91-141)."""
    crop_size = opt['crop_size']
    step = opt['step']
    thresh_size = opt['thresh_size']
    img_name, extension = osp.splitext(osp.basename(path))
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)

    h, w = img.shape[0:2]
    h_space = np.arange(0, h - crop_size + 1, step)
    if h - (h_space[-1] + crop_size) > thresh_size:
        h_space = np.append(h_space, h - crop_size)
    w_space = np.arange(0, w - crop_size + 1, step)
    if w - (w_space[-1] + crop_size) > thresh_size:
        w_space = np.append(w_space, w - crop_size)

    index = 0
    for x in h_space:
        for y in w_space:
            index += 1
            cropped_img = np.ascontiguousarray(
                img[x:x + crop_size, y:y + crop_size, ...])
            cv2.imwrite(
                osp.join(opt['save_folder'],
                         f'{img_name}_s{index:03d}{extension}'),
                cropped_img,
                [cv2.IMWRITE_PNG_COMPRESSION, opt['compression_level']])
    return path


if __name__ == '__main__':
    main()
