"""Paired LQ/GT image dataset (reference
basicsr/data/paired_image_dataset.py:11-110). Returns HWC RGB float32
numpy images keyed 'lq'/'gt' (NHWC batching downstream)."""
import numpy as np

from mrefsr_tpu.data.data_util import (paired_paths_from_folder,
                                       paired_paths_from_lmdb,
                                       paired_paths_from_meta_info_file,
                                       paired_paths_from_pack)
from mrefsr_tpu.data.transforms import augment, paired_random_crop
from mrefsr_tpu.utils import imfrombytes, img2tensor, rgb2ycbcr
from mrefsr_tpu.data.data_util import ensure_file_client
from mrefsr_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class PairedImageDataset:
    """Modes: lmdb / meta_info_file / folder (see reference docstring)."""

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.mean = opt.get('mean')
        self.std = opt.get('std')

        self.gt_folder = opt['dataroot_gt']
        self.lq_folder = opt['dataroot_lq']
        self.filename_tmpl = opt.get('filename_tmpl', '{}')

        if self.io_backend_opt['type'] == 'lmdb':
            self.io_backend_opt['db_paths'] = [self.lq_folder,
                                               self.gt_folder]
            self.io_backend_opt['client_keys'] = ['lq', 'gt']
            self.paths = paired_paths_from_lmdb(
                [self.lq_folder, self.gt_folder], ['lq', 'gt'])
        elif self.io_backend_opt['type'] == 'pack':
            # native packed shards: dataroot_* point at the .pack files
            self.io_backend_opt['db_paths'] = [self.lq_folder,
                                               self.gt_folder]
            self.io_backend_opt['client_keys'] = ['lq', 'gt']
            self.paths = paired_paths_from_pack(
                [self.lq_folder, self.gt_folder], ['lq', 'gt'])
        elif self.opt.get('meta_info_file') is not None:
            self.paths = paired_paths_from_meta_info_file(
                [self.lq_folder, self.gt_folder], ['lq', 'gt'],
                self.opt['meta_info_file'], self.filename_tmpl)
        else:
            self.paths = paired_paths_from_folder(
                [self.lq_folder, self.gt_folder], ['lq', 'gt'],
                self.filename_tmpl)

    def __getitem__(self, index):
        ensure_file_client(self)

        scale = self.opt['scale']

        gt_path = self.paths[index]['gt_path']
        img_gt = imfrombytes(self.file_client.get(gt_path, 'gt'),
                             float32=True)
        lq_path = self.paths[index]['lq_path']
        img_lq = imfrombytes(self.file_client.get(lq_path, 'lq'),
                             float32=True)

        if self.opt['phase'] == 'train':
            gt_size = self.opt['gt_size']
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, gt_size,
                                                scale, gt_path)
            img_gt, img_lq = augment([img_gt, img_lq],
                                     self.opt['use_hflip'],
                                     self.opt['use_rot'])

        if self.opt.get('color') == 'y':
            # inputs are BGR here; reference calls rgb2ycbcr on BGR data —
            # replicate call-site behavior (paired_image_dataset.py:92-94)
            img_gt = rgb2ycbcr(img_gt, y_only=True)[..., None]
            img_lq = rgb2ycbcr(img_lq, y_only=True)[..., None]

        if self.opt['phase'] != 'train':
            img_gt = img_gt[0:img_lq.shape[0] * scale,
                            0:img_lq.shape[1] * scale, :]

        img_gt, img_lq = img2tensor([img_gt, img_lq], bgr2rgb=True,
                                    float32=True)
        if self.mean is not None or self.std is not None:
            mean = np.asarray(self.mean, np.float32)
            std = np.asarray(self.std, np.float32)
            img_lq = (img_lq - mean) / std
            img_gt = (img_gt - mean) / std

        return {'lq': img_lq, 'gt': img_gt, 'lq_path': lq_path,
                'gt_path': gt_path}

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register()
class SingleImageDataset:
    """LQ-only dataset for inference
    (reference basicsr/data/single_image_dataset.py:11-68)."""

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.mean = opt.get('mean')
        self.std = opt.get('std')
        self.lq_folder = opt['dataroot_lq']

        if self.io_backend_opt['type'] == 'lmdb':
            from mrefsr_tpu.data.data_util import paths_from_lmdb
            self.io_backend_opt['db_paths'] = [self.lq_folder]
            self.io_backend_opt['client_keys'] = ['lq']
            self.paths = paths_from_lmdb(self.lq_folder)
        elif self.opt.get('meta_info_file') is not None:
            import os.path as osp
            with open(self.opt['meta_info_file'], 'r') as fin:
                self.paths = [
                    osp.join(self.lq_folder, line.rstrip().split(' ')[0])
                    for line in fin
                ]
        else:
            from mrefsr_tpu.data.data_util import paths_from_folder
            self.paths = sorted(paths_from_folder(self.lq_folder))

    def __getitem__(self, index):
        ensure_file_client(self)

        lq_path = self.paths[index]
        img_lq = imfrombytes(self.file_client.get(lq_path, 'lq'),
                             float32=True)
        if self.opt.get('color') == 'y':
            img_lq = rgb2ycbcr(img_lq, y_only=True)[..., None]
        img_lq = img2tensor(img_lq, bgr2rgb=True, float32=True)
        if self.mean is not None or self.std is not None:
            mean = np.asarray(self.mean, np.float32)
            std = np.asarray(self.std, np.float32)
            img_lq = (img_lq - mean) / std
        return {'lq': img_lq, 'lq_path': lq_path}

    def __len__(self):
        return len(self.paths)
