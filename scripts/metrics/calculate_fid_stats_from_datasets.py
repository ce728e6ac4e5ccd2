"""Precompute FID statistics of a dataset
(reference scripts/metrics/calculate_fid_stats_from_datasets.py)."""
import argparse
import math
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.data import build_dataset  # noqa: E402
from mrefsr_tpu.metrics.fid import (extract_inception_features,  # noqa: E402
                                    load_patched_inception_v3)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--num_sample', type=int, default=50000)
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--size', type=int, default=512)
    parser.add_argument('--dataroot', type=str, default='datasets/ffhq')
    parser.add_argument('--inception_path', type=str, default=None)
    args = parser.parse_args()

    opt = {'name': 'FFHQ', 'type': 'FFHQDataset', 'phase': 'train',
           'dataroot_gt': args.dataroot,
           'io_backend': dict(type='disk'),
           'use_hflip': False, 'mean': [0.5, 0.5, 0.5],
           'std': [0.5, 0.5, 0.5]}
    dataset = build_dataset(opt)

    _, _, feature_fn = load_patched_inception_v3(args.inception_path)
    total_batch = math.ceil(args.num_sample / args.batch_size)

    def data_generator(dataset, total_batch):
        for i in range(total_batch):
            imgs = [dataset[i * args.batch_size + j]['gt']
                    for j in range(args.batch_size)
                    if i * args.batch_size + j < len(dataset)]
            yield np.stack(imgs, axis=0)

    features = extract_inception_features(
        data_generator(dataset, total_batch), feature_fn, total_batch)
    features = features[:args.num_sample]
    print(f'Extracted {features.shape[0]} features.')
    mean = np.mean(features, 0)
    cov = np.cov(features, rowvar=False)

    import torch
    torch.save({'name': 'ffhq', 'size': args.size, 'mean': mean,
                'cov': cov},
               f'inception_ffhq_{args.size}.pth')


if __name__ == '__main__':
    main()
