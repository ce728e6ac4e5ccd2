"""Dataset registry, auto-scan, and dataloader construction
(reference basicsr/data/__init__.py:19-101)."""
import importlib
import random
from copy import deepcopy
from functools import partial
from os import path as osp

import numpy as np

from mrefsr_tpu.utils import get_root_logger, scandir
from mrefsr_tpu.utils.dist_util import get_dist_info
from mrefsr_tpu.utils.registry import DATASET_REGISTRY

from .data_sampler import EnlargedSampler
from .loader import DataLoader
from .prefetch_dataloader import (BackgroundDevicePrefetcher,
                                  CPUPrefetcher, DevicePrefetcher)

__all__ = ['build_dataset', 'build_dataloader', 'EnlargedSampler',
           'CPUPrefetcher', 'DevicePrefetcher',
           'BackgroundDevicePrefetcher']

data_folder = osp.dirname(osp.abspath(__file__))
dataset_filenames = [
    osp.splitext(osp.basename(v))[0]
    for v in scandir(data_folder) if v.endswith('_dataset.py')
]
_dataset_modules = [
    importlib.import_module(f'mrefsr_tpu.data.{file_name}')
    for file_name in dataset_filenames
]


def build_dataset(dataset_opt):
    """Instantiate a registered dataset from its YAML options."""
    dataset_opt = deepcopy(dataset_opt)
    dataset = DATASET_REGISTRY.get(dataset_opt['type'])(dataset_opt)
    logger = get_root_logger()
    logger.info(f'Dataset [{dataset.__class__.__name__}] - '
                f'{dataset_opt["name"]} is built.')
    return dataset


def build_dataloader(dataset, dataset_opt, num_gpu=1, dist=False,
                     sampler=None, seed=None):
    """Build a loader with the reference's phase semantics
    (reference data/__init__.py:40-94): train uses batch_size_per_gpu +
    workers + sampler; val/test always run batch 1, no workers."""
    phase = dataset_opt['phase']
    if phase == 'train':
        batch_size = dataset_opt['batch_size_per_gpu']
        num_workers = dataset_opt.get('num_worker_per_gpu', 4)
        loader = DataLoader(
            dataset, batch_size=batch_size,
            shuffle=(sampler is None), sampler=sampler,
            num_workers=num_workers, drop_last=True, seed=seed)
    elif phase in ('val', 'test'):
        loader = DataLoader(dataset, batch_size=1, shuffle=False,
                            num_workers=0)
    else:
        raise ValueError(f'Wrong dataset phase: {phase}. '
                         "Supported ones are 'train', 'val' and 'test'.")
    return loader
