"""REDS training datasets (reference basicsr/data/reds_dataset.py).

Outputs NHWC: 'lq' is (t, h, w, c), 'gt' is (h, w, c) for the sliding-
window variant and (t, h, w, c) for the recurrent variant.
"""
import random
from pathlib import Path

import numpy as np

from mrefsr_tpu.utils import (get_root_logger, imfrombytes,
                              img2tensor)
from mrefsr_tpu.utils.flow_util import dequantize_flow
from mrefsr_tpu.utils.registry import DATASET_REGISTRY
from mrefsr_tpu.data.data_util import ensure_file_client

from .transforms import augment, paired_random_crop


@DATASET_REGISTRY.register()
class REDSDataset:
    """Sliding-window REDS training set (reference reds_dataset.py:14-210):
    meta-info keys, REDS4/official val-partition exclusion, temporal
    interval augmentation, optional quantized flows."""

    def __init__(self, opt):
        self.opt = opt
        self.gt_root = Path(opt['dataroot_gt'])
        self.lq_root = Path(opt['dataroot_lq'])
        self.flow_root = Path(opt['dataroot_flow']) \
            if opt.get('dataroot_flow') is not None else None
        assert opt['num_frame'] % 2 == 1, (
            f'num_frame should be odd number, but got {opt["num_frame"]}')
        self.num_frame = opt['num_frame']
        self.num_half_frames = opt['num_frame'] // 2

        self.keys = []
        with open(opt['meta_info_file'], 'r') as fin:
            for line in fin:
                folder, frame_num, _ = line.split(' ')
                self.keys.extend(
                    [f'{folder}/{i:08d}' for i in range(int(frame_num))])

        val_partition = _val_partition(opt['val_partition'])
        self.keys = [v for v in self.keys
                     if v.split('/')[0] not in val_partition]

        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.is_lmdb = False
        if self.io_backend_opt['type'] == 'lmdb':
            self.is_lmdb = True
            if self.flow_root is not None:
                self.io_backend_opt['db_paths'] = [
                    self.lq_root, self.gt_root, self.flow_root]
                self.io_backend_opt['client_keys'] = ['lq', 'gt', 'flow']
            else:
                self.io_backend_opt['db_paths'] = [self.lq_root,
                                                   self.gt_root]
                self.io_backend_opt['client_keys'] = ['lq', 'gt']

        self.interval_list = opt['interval_list']
        self.random_reverse = opt['random_reverse']
        interval_str = ','.join(str(x) for x in opt['interval_list'])
        get_root_logger().info(
            f'Temporal augmentation interval list: [{interval_str}]; '
            f'random reverse is {self.random_reverse}.')

    def __getitem__(self, index):
        ensure_file_client(self)

        scale = self.opt['scale']
        gt_size = self.opt['gt_size']
        key = self.keys[index]
        clip_name, frame_name = key.split('/')
        center_frame_idx = int(frame_name)

        interval = random.choice(self.interval_list)
        # keep the window inside the 100-frame clip (reference :113-119)
        start_frame_idx = center_frame_idx - self.num_half_frames * interval
        end_frame_idx = center_frame_idx + self.num_half_frames * interval
        while (start_frame_idx < 0) or (end_frame_idx > 99):
            center_frame_idx = random.randint(0, 99)
            start_frame_idx = (center_frame_idx
                               - self.num_half_frames * interval)
            end_frame_idx = center_frame_idx + self.num_half_frames * interval
        frame_name = f'{center_frame_idx:08d}'
        neighbor_list = list(
            range(start_frame_idx, end_frame_idx + 1, interval))
        if self.random_reverse and random.random() < 0.5:
            neighbor_list.reverse()
        assert len(neighbor_list) == self.num_frame, (
            f'Wrong length of neighbor list: {len(neighbor_list)}')

        if self.is_lmdb:
            img_gt_path = f'{clip_name}/{frame_name}'
        else:
            img_gt_path = self.gt_root / clip_name / f'{frame_name}.png'
        img_gt = imfrombytes(self.file_client.get(img_gt_path, 'gt'),
                             float32=True)

        img_lqs = []
        for neighbor in neighbor_list:
            if self.is_lmdb:
                img_lq_path = f'{clip_name}/{neighbor:08d}'
            else:
                img_lq_path = self.lq_root / clip_name / f'{neighbor:08d}.png'
            img_lqs.append(
                imfrombytes(self.file_client.get(img_lq_path, 'lq'),
                            float32=True))

        if self.flow_root is not None:
            img_flows = []
            # previous flows then next flows (reference :148-172)
            for tag, rng in (('p', range(self.num_half_frames, 0, -1)),
                             ('n', range(1, self.num_half_frames + 1))):
                for i in rng:
                    if self.is_lmdb:
                        flow_path = f'{clip_name}/{frame_name}_{tag}{i}'
                    else:
                        flow_path = (self.flow_root / clip_name /
                                     f'{frame_name}_{tag}{i}.png')
                    cat_flow = imfrombytes(
                        self.file_client.get(flow_path, 'flow'),
                        flag='grayscale', float32=False)
                    dx, dy = np.split(cat_flow, 2, axis=0)
                    img_flows.append(
                        dequantize_flow(dx, dy, max_val=20, denorm=False))
            img_lqs.extend(img_flows)

        img_gt, img_lqs = paired_random_crop(img_gt, img_lqs, gt_size,
                                             scale, img_gt_path)
        if self.flow_root is not None:
            img_lqs, img_flows = (img_lqs[:self.num_frame],
                                  img_lqs[self.num_frame:])

        img_lqs.append(img_gt)
        if self.flow_root is not None:
            img_results, img_flows = augment(
                img_lqs, self.opt['use_hflip'], self.opt['use_rot'],
                img_flows)
        else:
            img_results = augment(img_lqs, self.opt['use_hflip'],
                                  self.opt['use_rot'])

        img_results = img2tensor(img_results)
        img_lqs = np.stack(img_results[0:-1], axis=0)
        img_gt = img_results[-1]

        if self.flow_root is not None:
            img_flows.insert(self.num_half_frames,
                             np.zeros_like(img_flows[0]))
            img_flows = np.stack(
                [f.astype(np.float32) for f in img_flows], axis=0)
            return {'lq': img_lqs, 'flow': img_flows, 'gt': img_gt,
                    'key': key}
        return {'lq': img_lqs, 'gt': img_gt, 'key': key}

    def __len__(self):
        return len(self.keys)


def _val_partition(name):
    if name == 'REDS4':
        return ['000', '011', '015', '020']
    if name == 'official':
        return [f'{v:03d}' for v in range(240, 270)]
    raise ValueError(f'Wrong validation partition {name}.'
                     f"Supported ones are ['official', 'REDS4'].")


@DATASET_REGISTRY.register()
class REDSRecurrentDataset:
    """Recurrent REDS training set: num_frame consecutive LQ+GT frames
    (reference reds_dataset.py:213-360)."""

    def __init__(self, opt):
        self.opt = opt
        self.gt_root = Path(opt['dataroot_gt'])
        self.lq_root = Path(opt['dataroot_lq'])
        self.num_frame = opt['num_frame']

        self.keys = []
        with open(opt['meta_info_file'], 'r') as fin:
            for line in fin:
                folder, frame_num, _ = line.split(' ')
                self.keys.extend(
                    [f'{folder}/{i:08d}' for i in range(int(frame_num))])

        val_partition = _val_partition(opt['val_partition'])
        if opt.get('test_mode'):
            self.keys = [v for v in self.keys
                         if v.split('/')[0] in val_partition]
        else:
            self.keys = [v for v in self.keys
                         if v.split('/')[0] not in val_partition]

        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.is_lmdb = self.io_backend_opt['type'] == 'lmdb'
        if self.is_lmdb:
            self.io_backend_opt['db_paths'] = [self.lq_root, self.gt_root]
            self.io_backend_opt['client_keys'] = ['lq', 'gt']

        self.interval_list = opt.get('interval_list', [1])
        self.random_reverse = opt.get('random_reverse', False)

    def __getitem__(self, index):
        ensure_file_client(self)

        scale = self.opt['scale']
        gt_size = self.opt['gt_size']
        key = self.keys[index]
        clip_name, frame_name = key.split('/')

        interval = random.choice(self.interval_list)
        start_frame_idx = int(frame_name)
        if start_frame_idx > 100 - self.num_frame * interval:
            start_frame_idx = random.randint(
                0, 100 - self.num_frame * interval)
        end_frame_idx = start_frame_idx + self.num_frame * interval
        neighbor_list = list(range(start_frame_idx, end_frame_idx,
                                   interval))
        if self.random_reverse and random.random() < 0.5:
            neighbor_list.reverse()

        img_lqs, img_gts = [], []
        for neighbor in neighbor_list:
            if self.is_lmdb:
                img_lq_path = f'{clip_name}/{neighbor:08d}'
                img_gt_path = f'{clip_name}/{neighbor:08d}'
            else:
                img_lq_path = self.lq_root / clip_name / f'{neighbor:08d}.png'
                img_gt_path = self.gt_root / clip_name / f'{neighbor:08d}.png'
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
        img_gts = np.stack(img_results[len(img_results) // 2:], axis=0)
        img_lqs = np.stack(img_results[:len(img_results) // 2], axis=0)
        return {'lq': img_lqs, 'gt': img_gts, 'key': key}

    def __len__(self):
        return len(self.keys)
