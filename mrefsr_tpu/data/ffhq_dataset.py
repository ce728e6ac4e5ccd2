"""FFHQ dataset for StyleGAN training
(reference basicsr/data/ffhq_dataset.py:13-77). NHWC RGB output,
mean/std-normalized."""
import random
import time
from os import path as osp

import numpy as np

from mrefsr_tpu.utils import (get_root_logger, imfrombytes,
                              img2tensor)
from mrefsr_tpu.utils.registry import DATASET_REGISTRY
from mrefsr_tpu.data.data_util import ensure_file_client

from .transforms import augment


@DATASET_REGISTRY.register()
class FFHQDataset:
    """FFHQ: 70000 aligned face images."""

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.gt_folder = opt['dataroot_gt']
        self.mean = opt['mean']
        self.std = opt['std']

        if self.io_backend_opt['type'] == 'lmdb':
            self.io_backend_opt['db_paths'] = self.gt_folder
            if not self.gt_folder.endswith('.lmdb'):
                raise ValueError("'dataroot_gt' should end with '.lmdb', "
                                 f'but received {self.gt_folder}')
            with open(osp.join(self.gt_folder, 'meta_info.txt')) as fin:
                self.paths = [line.split('.')[0] for line in fin]
        elif self.opt.get('num_images'):
            self.paths = [osp.join(self.gt_folder, f'{v:08d}.png')
                          for v in range(self.opt['num_images'])]
        else:
            from mrefsr_tpu.utils.misc import scandir
            self.paths = sorted(osp.join(self.gt_folder, v)
                                for v in scandir(self.gt_folder))

    def __getitem__(self, index):
        ensure_file_client(self)

        gt_path = self.paths[index]
        retry = 3
        img_bytes = None
        last_err = None
        while retry > 0:
            try:
                img_bytes = self.file_client.get(gt_path)
            except Exception as e:
                last_err = e
                get_root_logger().warning(
                    f'File client error: {e}, remaining retry times: '
                    f'{retry - 1}')
                index = random.randint(0, self.__len__() - 1)
                gt_path = self.paths[index]
                time.sleep(1)
            else:
                break
            finally:
                retry -= 1
        if img_bytes is None:
            raise IOError(
                f'Failed to read a training image after retries '
                f'(last: {gt_path})') from last_err
        img_gt = imfrombytes(img_bytes, float32=True)
        img_gt = augment(img_gt, hflip=self.opt['use_hflip'],
                         rotation=False)
        img_gt = img2tensor(img_gt, bgr2rgb=True, float32=True)
        mean = np.asarray(self.mean, np.float32)
        std = np.asarray(self.std, np.float32)
        img_gt = (img_gt - mean) / std
        return {'gt': img_gt, 'gt_path': gt_path}

    def __len__(self):
        return len(self.paths)
