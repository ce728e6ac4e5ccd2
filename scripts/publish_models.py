"""Stamp released checkpoints with an 8-char sha256
(reference scripts/publish_models.py)."""
import glob
import subprocess
import sys
from os import path as osp

import torch


def update_sha(paths):
    print('# Update sha ...')
    for idx, path in enumerate(paths):
        print(f'{idx + 1:03d}: Processing {path}')
        net = torch.load(path, map_location='cpu', weights_only=True)
        basename = osp.basename(path)
        if 'params' not in net and 'params_ema' not in net:
            resp = input(f'WARN: Model {basename} does not have '
                         '"params"/"params_ema" key. Continue? Y/N\n')
            if resp.lower() == 'n':
                raise ValueError('Please modify..')
            if resp.lower() != 'y':
                raise ValueError('Wrong input. Only accepts Y/N.')

        new_sha = subprocess.check_output(
            ['sha256sum', path]).decode()[:8]
        if '-' in basename:
            old_sha = basename.split('-')[1].split('.')[0]
            if old_sha != new_sha:
                final_file = path.split('-')[0] + f'-{new_sha}.pth'
                print(f'\tSave from {path} to {final_file}')
                subprocess.run(['mv', path, final_file], check=True)
        else:
            final_file = path.split('.pth')[0] + f'-{new_sha}.pth'
            print(f'\tSave from {path} to {final_file}')
            subprocess.run(['mv', path, final_file], check=True)


if __name__ == '__main__':
    paths = (glob.glob('experiments/pretrained_models/*.pth')
             + glob.glob('experiments/pretrained_models/**/*.pth'))
    update_sha(paths)
