"""FID between a folder and precomputed dataset stats
(reference scripts/metrics/calculate_fid_folder.py)."""
import argparse
import math
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.data import build_dataloader, build_dataset  # noqa: E402
from mrefsr_tpu.metrics.fid import (calculate_fid,  # noqa: E402
                                    extract_inception_features,
                                    load_patched_inception_v3)


def calculate_fid_folder():
    parser = argparse.ArgumentParser()
    parser.add_argument('folder', type=str, help='Path to the folder.')
    parser.add_argument('--fid_stats', type=str,
                        help='Path to the dataset fid statistics (.pth)')
    parser.add_argument('--inception_path', type=str, default=None,
                        help='Converted pt_inception weights (.pth)')
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--num_sample', type=int, default=50000)
    parser.add_argument('--num_workers', type=int, default=4)
    parser.add_argument('--backend', type=str, default='disk')
    args = parser.parse_args()

    _, _, feature_fn = load_patched_inception_v3(args.inception_path)

    opt = {'name': 'SingleImageDataset', 'type': 'SingleImageDataset',
           'phase': 'val', 'dataroot_lq': args.folder,
           'io_backend': dict(type=args.backend),
           'mean': [0.5, 0.5, 0.5], 'std': [0.5, 0.5, 0.5]}
    dataset = build_dataset(opt)

    num_sample = min(args.num_sample, len(dataset))
    total_batch = math.ceil(num_sample / args.batch_size)

    def data_generator(dataset, total_batch):
        for i in range(total_batch):
            imgs = [dataset[i * args.batch_size + j]['lq']
                    for j in range(args.batch_size)
                    if i * args.batch_size + j < len(dataset)]
            yield np.stack(imgs, axis=0)

    features = extract_inception_features(
        data_generator(dataset, total_batch), feature_fn, total_batch)
    features = features[:num_sample]
    sample_mu = np.mean(features, 0)
    sample_cov = np.cov(features, rowvar=False)

    # load the dataset stats
    import torch
    stats = torch.load(args.fid_stats, map_location='cpu')
    real_mu = np.asarray(stats['mean'])
    real_cov = np.asarray(stats['cov'])

    fid = calculate_fid(sample_mu, sample_cov, real_mu, real_cov)
    print('fid:', fid)


if __name__ == '__main__':
    calculate_fid_folder()
