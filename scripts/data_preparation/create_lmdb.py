"""LMDB creation for DIV2K / REDS / Vimeo90K
(reference scripts/data_preparation/create_lmdb.py)."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.utils.lmdb_util import make_lmdb_from_imgs  # noqa: E402
from mrefsr_tpu.utils.misc import scandir  # noqa: E402


def prepare_keys_div2k(folder_path):
    print('Reading image path list ...')
    img_path_list = sorted(
        scandir(folder_path, suffix='png', recursive=False))
    keys = [img_path.split('.png')[0] for img_path in img_path_list]
    return img_path_list, keys


def create_lmdb_for_div2k():
    for folder_path, lmdb_path in (
            ('datasets/DIV2K/DIV2K_train_HR_sub',
             'datasets/DIV2K/DIV2K_train_HR_sub.lmdb'),
            ('datasets/DIV2K/DIV2K_train_LR_bicubic/X2_sub',
             'datasets/DIV2K/DIV2K_train_LR_bicubic_X2_sub.lmdb'),
            ('datasets/DIV2K/DIV2K_train_LR_bicubic/X3_sub',
             'datasets/DIV2K/DIV2K_train_LR_bicubic_X3_sub.lmdb'),
            ('datasets/DIV2K/DIV2K_train_LR_bicubic/X4_sub',
             'datasets/DIV2K/DIV2K_train_LR_bicubic_X4_sub.lmdb')):
        img_path_list, keys = prepare_keys_div2k(folder_path)
        make_lmdb_from_imgs(folder_path, lmdb_path, img_path_list, keys)


def prepare_keys_reds(folder_path):
    print('Reading image path list ...')
    img_path_list = sorted(
        scandir(folder_path, suffix='png', recursive=True))
    keys = [v.split('.png')[0] for v in img_path_list]  # 000/00000000
    return img_path_list, keys


def create_lmdb_for_reds():
    for folder_path, lmdb_path in (
            ('datasets/REDS/train_sharp',
             'datasets/REDS/train_sharp_with_val.lmdb'),
            ('datasets/REDS/train_sharp_bicubic',
             'datasets/REDS/train_sharp_bicubic_with_val.lmdb')):
        img_path_list, keys = prepare_keys_reds(folder_path)
        make_lmdb_from_imgs(folder_path, lmdb_path, img_path_list, keys,
                            multiprocessing_read=True)


def prepare_keys_vimeo90k(folder_path, train_list_path, mode):
    """(reference create_lmdb.py:123-160): 'gt' keeps only im4."""
    print('Reading image path list ...')
    with open(train_list_path, 'r') as fin:
        train_list = [line.strip() for line in fin]
    img_path_list, keys = [], []
    for line in train_list:
        folder, sub_folder = line.split('/')
        frames = ['im4.png'] if mode == 'gt' else [
            f'im{i}.png' for i in range(1, 8)]
        img_path_list.extend(
            [osp.join(folder, sub_folder, f) for f in frames])
        keys.extend(
            [f'{folder}/{sub_folder}/{f.split(".png")[0]}'
             for f in frames])
    return img_path_list, keys


def create_lmdb_for_vimeo90k():
    for folder_path, lmdb_path, mode in (
            ('datasets/vimeo90k/vimeo_septuplet/sequences',
             'datasets/vimeo90k/vimeo90k_train_GT_only4th.lmdb', 'gt'),
            ('datasets/vimeo90k/vimeo_septuplet_matlabLRx4/sequences',
             'datasets/vimeo90k/vimeo90k_train_LR7frames.lmdb', 'lq')):
        train_list_path = ('datasets/vimeo90k/vimeo_septuplet/'
                           'sep_trainlist.txt')
        img_path_list, keys = prepare_keys_vimeo90k(
            folder_path, train_list_path, mode)
        make_lmdb_from_imgs(folder_path, lmdb_path, img_path_list, keys,
                            multiprocessing_read=True)


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--dataset', type=str,
                        help="'div2k', 'reds', 'vimeo90k'")
    args = parser.parse_args()
    if args.dataset == 'div2k':
        create_lmdb_for_div2k()
    elif args.dataset == 'reds':
        create_lmdb_for_reds()
    elif args.dataset == 'vimeo90k':
        create_lmdb_for_vimeo90k()
    else:
        raise ValueError("Wrong dataset: supported are 'div2k', 'reds', "
                         "'vimeo90k'")
