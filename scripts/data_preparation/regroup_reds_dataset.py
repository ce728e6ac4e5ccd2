"""Merge REDS train+val clips (val renumbered 240-269)
(reference scripts/data_preparation/regroup_reds_dataset.py)."""
import glob
import os
import shutil


def regroup_reds_dataset(train_path, val_path):
    val_folders = glob.glob(os.path.join(val_path, '*'))
    for folder in val_folders:
        new_folder_idx = int(folder.split('/')[-1]) + 240
        shutil.copytree(
            folder, os.path.join(train_path, str(new_folder_idx)))


if __name__ == '__main__':
    regroup_reds_dataset('datasets/REDS/train_sharp',
                         'datasets/REDS/val_sharp')
    regroup_reds_dataset('datasets/REDS/train_sharp_bicubic/X4',
                         'datasets/REDS/val_sharp_bicubic/X4')
