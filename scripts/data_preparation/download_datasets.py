"""Download benchmark datasets from google drive
(reference scripts/data_preparation/download_datasets.py)."""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.utils.download_util import \
    download_file_from_google_drive  # noqa: E402

FILE_IDS = {
    'Set5': {'Set5.zip': '1RtyIeUFTyW8u4zAEhmdQ3FWLv1Cy7EqA'},
    'Set14': {'Set14.zip': '1CzwwAtLSW9sog3acXj8s7Hg3S7kr2HiZ'},
}


def download_dataset(dataset, file_ids):
    save_path_root = './datasets/'
    os.makedirs(save_path_root, exist_ok=True)
    for file_name, file_id in file_ids.items():
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
    parser.add_argument('dataset', type=str,
                        help="one of FILE_IDS keys, or 'all'")
    args = parser.parse_args()
    if args.dataset == 'all':
        for ds in FILE_IDS:
            download_dataset(ds, FILE_IDS[ds])
    else:
        download_dataset(args.dataset, FILE_IDS[args.dataset])
