"""Vimeo90K training datasets (reference basicsr/data/vimeo90k_dataset.py).

NHWC outputs: 'lq' (t, h, w, c); 'gt' (h, w, c) sliding-window /
(t, h, w, c) recurrent.
"""
import random
from pathlib import Path

import numpy as np

from mrefsr_tpu.utils import get_root_logger, imfrombytes, \
    img2tensor
from mrefsr_tpu.utils.registry import DATASET_REGISTRY
from mrefsr_tpu.data.data_util import ensure_file_client

from .transforms import augment, paired_random_crop


@DATASET_REGISTRY.register()
class Vimeo90KDataset:
    """Sliding-window Vimeo90K: GT is the center frame im4
    (reference vimeo90k_dataset.py:12-127)."""

    def __init__(self, opt):
        self.opt = opt
        self.gt_root = Path(opt['dataroot_gt'])
        self.lq_root = Path(opt['dataroot_lq'])

        with open(opt['meta_info_file'], 'r') as fin:
            self.keys = [line.split(' ')[0] for line in fin]

        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.is_lmdb = self.io_backend_opt['type'] == 'lmdb'
        if self.is_lmdb:
            self.io_backend_opt['db_paths'] = [self.lq_root, self.gt_root]
            self.io_backend_opt['client_keys'] = ['lq', 'gt']

        # neighboring frame indices within the 7-frame septuplet
        self.neighbor_list = [
            i + (9 - opt['num_frame']) // 2 for i in range(opt['num_frame'])]

        self.random_reverse = opt['random_reverse']
        get_root_logger().info(f'Random reverse is {self.random_reverse}.')

    def __getitem__(self, index):
        ensure_file_client(self)

        # LOCAL copy: our loader workers are threads sharing this
        # dataset object — reversing self.neighbor_list in place (the
        # reference's pattern, safe only with process workers) scrambles
        # a concurrent worker's frame order mid-iteration
        neighbor_list = list(self.neighbor_list)
        if self.random_reverse and random.random() < 0.5:
            neighbor_list.reverse()

        scale = self.opt['scale']
        gt_size = self.opt['gt_size']
        key = self.keys[index]
        clip, seq = key.split('/')

        if self.is_lmdb:
            img_gt_path = f'{key}/im4'
        else:
            img_gt_path = self.gt_root / clip / seq / 'im4.png'
        img_gt = imfrombytes(self.file_client.get(img_gt_path, 'gt'),
                             float32=True)

        img_lqs = []
        for neighbor in neighbor_list:
            if self.is_lmdb:
                img_lq_path = f'{clip}/{seq}/im{neighbor}'
            else:
                img_lq_path = self.lq_root / clip / seq / f'im{neighbor}.png'
            img_lqs.append(
                imfrombytes(self.file_client.get(img_lq_path, 'lq'),
                            float32=True))

        img_gt, img_lqs = paired_random_crop(img_gt, img_lqs, gt_size,
                                             scale, img_gt_path)
        img_lqs.append(img_gt)
        img_results = augment(img_lqs, self.opt['use_hflip'],
                              self.opt['use_rot'])
        img_results = img2tensor(img_results)
        img_lqs = np.stack(img_results[0:-1], axis=0)
        img_gt = img_results[-1]
        return {'lq': img_lqs, 'gt': img_gt, 'key': key}

    def __len__(self):
        return len(self.keys)


@DATASET_REGISTRY.register()
class Vimeo90KRecurrentDataset(Vimeo90KDataset):
    """Recurrent Vimeo90K: all 7 frames as LQ+GT, optional sequence flip
    to 14 frames (reference vimeo90k_dataset.py:130-196)."""

    def __init__(self, opt):
        super().__init__(opt)
        self.flip_sequence = opt['flip_sequence']
        self.neighbor_list = [1, 2, 3, 4, 5, 6, 7]

    def __getitem__(self, index):
        ensure_file_client(self)

        # LOCAL copy: our loader workers are threads sharing this
        # dataset object — reversing self.neighbor_list in place (the
        # reference's pattern, safe only with process workers) scrambles
        # a concurrent worker's frame order mid-iteration
        neighbor_list = list(self.neighbor_list)
        if self.random_reverse and random.random() < 0.5:
            neighbor_list.reverse()

        scale = self.opt['scale']
        gt_size = self.opt['gt_size']
        key = self.keys[index]
        clip, seq = key.split('/')

        img_lqs, img_gts = [], []
        for neighbor in neighbor_list:
            if self.is_lmdb:
                img_lq_path = f'{clip}/{seq}/im{neighbor}'
                img_gt_path = f'{clip}/{seq}/im{neighbor}'
            else:
                img_lq_path = self.lq_root / clip / seq / f'im{neighbor}.png'
                img_gt_path = self.gt_root / clip / seq / f'im{neighbor}.png'
            img_lqs.append(
                imfrombytes(self.file_client.get(img_lq_path, 'lq'),
                            float32=True))
            img_gts.append(
                imfrombytes(self.file_client.get(img_gt_path, 'gt'),
                            float32=True))

        img_gts, img_lqs = paired_random_crop(img_gts, img_lqs, gt_size,
                                              scale, img_gt_path)
        img_lqs.extend(img_gts)
        img_results = augment(img_lqs, self.opt['use_hflip'],
                              self.opt['use_rot'])
        img_results = img2tensor(img_results)
        img_lqs = np.stack(img_results[:7], axis=0)
        img_gts = np.stack(img_results[7:], axis=0)

        if self.flip_sequence:  # 7 frames -> 14 frames
            img_lqs = np.concatenate([img_lqs, img_lqs[::-1]], axis=0)
            img_gts = np.concatenate([img_gts, img_gts[::-1]], axis=0)

        return {'lq': img_lqs, 'gt': img_gts, 'key': key}

    def __len__(self):
        return len(self.keys)
