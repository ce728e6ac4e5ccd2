"""Download pretrained .pth models from google drive
(reference scripts/download_pretrained_models.py). The checkpoints load
directly through mrefsr_tpu.convert.torch_to_flax."""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from mrefsr_tpu.utils.download_util import \
    download_file_from_google_drive  # noqa: E402

# file ids as published by the reference repo
FILE_IDS = {
    'ESRGAN': {
        'ESRGAN_SRx4_DF2KOST_official-ff704c30.pth':
            '1b3_bWZTjNO3iL2js1yWkJfjZykcQgvzT',
        'ESRGAN_PSNR_SRx4_DF2K_official-150ff491.pth':
            '1swaV5iBMFfg-DL6ZyiARztbhutDCWXMM',
    },
    'EDVR': {},
    'StyleGAN': {},
    'EDSR': {},
    'DUF': {},
    'DFDNet': {},
    'TOF': {},
    'flownet': {
        'spynet_sintel_final-3d2a1287.pth': '',
    },
    'BasicVSR': {},
}


def download_pretrained_models(method, file_ids):
    save_path_root = f'./experiments/pretrained_models/{method}'
    os.makedirs(save_path_root, exist_ok=True)
    for file_name, file_id in file_ids.items():
        if not file_id:
            print(f'No public file id recorded for {file_name}; '
                  'download it manually from the reference model zoo.')
            continue
        save_path = osp.abspath(osp.join(save_path_root, file_name))
        if osp.exists(save_path):
            resp = input(f'{file_name} already exists. Cover it? Y/N\n')
            if resp.lower() == 'n':
                print(f'Skipping {file_name}')
                continue
            if resp.lower() != 'y':
                raise ValueError('Wrong input. Only accepts Y/N.')
        print(f'Downloading {file_name} to {save_path}')
        download_file_from_google_drive(file_id, save_path)


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('method', type=str,
                        help="one of FILE_IDS keys, or 'all'")
    args = parser.parse_args()
    if args.method == 'all':
        for method in FILE_IDS:
            download_pretrained_models(method, FILE_IDS[method])
    else:
        download_pretrained_models(args.method, FILE_IDS[args.method])
