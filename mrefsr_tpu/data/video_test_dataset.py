"""Video test datasets (reference basicsr/data/video_test_dataset.py).

NHWC outputs: 'lq' (t, h, w, c), 'gt' (h, w, c) (or (t, h, w, c) for
the recurrent variant).
"""
import glob
from os import path as osp

import numpy as np

from mrefsr_tpu.utils import get_root_logger, scandir
from mrefsr_tpu.utils.registry import DATASET_REGISTRY

from .data_util import (duf_downsample, generate_frame_indices,
                        read_img_seq)


@DATASET_REGISTRY.register()
class VideoTestDataset:
    """Frame-wise video test set for Vid4 / REDS4 / REDSofficial
    (reference video_test_dataset.py:12-131)."""

    def __init__(self, opt):
        self.opt = opt
        self.cache_data = opt['cache_data']
        self.gt_root, self.lq_root = opt['dataroot_gt'], opt['dataroot_lq']
        self.data_info = {'lq_path': [], 'gt_path': [], 'folder': [],
                          'idx': [], 'border': []}
        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        assert self.io_backend_opt['type'] != 'lmdb', \
            'No need to use lmdb during validation/test.'

        logger = get_root_logger()
        logger.info(f'Generate data info for VideoTestDataset - '
                    f'{opt["name"]}')
        self.imgs_lq, self.imgs_gt = {}, {}
        if 'meta_info_file' in opt and opt['meta_info_file']:
            with open(opt['meta_info_file'], 'r') as fin:
                subfolders = [line.split(' ')[0] for line in fin]
                subfolders_lq = [osp.join(self.lq_root, key)
                                 for key in subfolders]
                subfolders_gt = [osp.join(self.gt_root, key)
                                 for key in subfolders]
        else:
            subfolders_lq = sorted(glob.glob(osp.join(self.lq_root, '*')))
            subfolders_gt = sorted(glob.glob(osp.join(self.gt_root, '*')))

        if opt['name'].lower() in ('vid4', 'reds4', 'redsofficial'):
            for subfolder_lq, subfolder_gt in zip(subfolders_lq,
                                                  subfolders_gt):
                subfolder_name = osp.basename(subfolder_lq)
                img_paths_lq = sorted(
                    scandir(subfolder_lq, full_path=True))
                img_paths_gt = sorted(
                    scandir(subfolder_gt, full_path=True))
                max_idx = len(img_paths_lq)
                assert max_idx == len(img_paths_gt), (
                    f'Different number of images in lq ({max_idx}) and gt '
                    f'folders ({len(img_paths_gt)})')

                self.data_info['lq_path'].extend(img_paths_lq)
                self.data_info['gt_path'].extend(img_paths_gt)
                self.data_info['folder'].extend([subfolder_name] * max_idx)
                for i in range(max_idx):
                    self.data_info['idx'].append(f'{i}/{max_idx}')
                border_l = [0] * max_idx
                for i in range(self.opt['num_frame'] // 2):
                    border_l[i] = 1
                    border_l[max_idx - i - 1] = 1
                self.data_info['border'].extend(border_l)

                if self.cache_data:
                    logger.info(
                        f'Cache {subfolder_name} for VideoTestDataset...')
                    self.imgs_lq[subfolder_name] = read_img_seq(
                        img_paths_lq)
                    self.imgs_gt[subfolder_name] = read_img_seq(
                        img_paths_gt)
                else:
                    self.imgs_lq[subfolder_name] = img_paths_lq
                    self.imgs_gt[subfolder_name] = img_paths_gt
        else:
            raise ValueError(
                f'Non-supported video test dataset: {type(opt["name"])}')

    def __getitem__(self, index):
        folder = self.data_info['folder'][index]
        idx, max_idx = self.data_info['idx'][index].split('/')
        idx, max_idx = int(idx), int(max_idx)
        border = self.data_info['border'][index]
        lq_path = self.data_info['lq_path'][index]

        select_idx = generate_frame_indices(idx, max_idx,
                                            self.opt['num_frame'],
                                            padding=self.opt['padding'])
        if self.cache_data:
            imgs_lq = self.imgs_lq[folder][select_idx]
            img_gt = self.imgs_gt[folder][idx]
        else:
            img_paths_lq = [self.imgs_lq[folder][i] for i in select_idx]
            imgs_lq = read_img_seq(img_paths_lq)
            img_gt = read_img_seq([self.imgs_gt[folder][idx]])[0]

        return {
            'lq': imgs_lq,            # (t, h, w, c)
            'gt': img_gt,             # (h, w, c)
            'folder': folder,
            'idx': self.data_info['idx'][index],
            'border': border,
            'lq_path': lq_path,       # center frame
        }

    def __len__(self):
        return len(self.data_info['gt_path'])


@DATASET_REGISTRY.register()
class VideoTestVimeo90KDataset:
    """Vimeo90K-Test: center frame only
    (reference video_test_dataset.py:133-199)."""

    def __init__(self, opt):
        self.opt = opt
        self.cache_data = opt['cache_data']
        if self.cache_data:
            raise NotImplementedError(
                'cache_data in Vimeo90K-Test dataset is not implemented.')
        self.gt_root, self.lq_root = opt['dataroot_gt'], opt['dataroot_lq']
        self.data_info = {'lq_path': [], 'gt_path': [], 'folder': [],
                          'idx': [], 'border': []}
        neighbor_list = [i + (9 - opt['num_frame']) // 2
                         for i in range(opt['num_frame'])]

        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        assert self.io_backend_opt['type'] != 'lmdb', \
            'No need to use lmdb during validation/test.'

        get_root_logger().info(
            f'Generate data info for VideoTestDataset - {opt["name"]}')
        with open(opt['meta_info_file'], 'r') as fin:
            subfolders = [line.split(' ')[0] for line in fin]
        for idx, subfolder in enumerate(subfolders):
            gt_path = osp.join(self.gt_root, subfolder, 'im4.png')
            self.data_info['gt_path'].append(gt_path)
            lq_paths = [osp.join(self.lq_root, subfolder, f'im{i}.png')
                        for i in neighbor_list]
            self.data_info['lq_path'].append(lq_paths)
            self.data_info['folder'].append('vimeo90k')
            self.data_info['idx'].append(f'{idx}/{len(subfolders)}')
            self.data_info['border'].append(0)

    def __getitem__(self, index):
        lq_path = self.data_info['lq_path'][index]
        gt_path = self.data_info['gt_path'][index]
        imgs_lq = read_img_seq(lq_path)
        img_gt = read_img_seq([gt_path])[0]
        return {
            'lq': imgs_lq,
            'gt': img_gt,
            'folder': self.data_info['folder'][index],
            'idx': self.data_info['idx'][index],
            'border': self.data_info['border'][index],
            'lq_path': lq_path[self.opt['num_frame'] // 2],
        }

    def __len__(self):
        return len(self.data_info['gt_path'])


@DATASET_REGISTRY.register()
class VideoTestDUFDataset(VideoTestDataset):
    """DUF test set: optionally synthesize LQ by Gaussian blur +
    subsampling of GT (reference video_test_dataset.py:202-252)."""

    def __getitem__(self, index):
        folder = self.data_info['folder'][index]
        idx, max_idx = self.data_info['idx'][index].split('/')
        idx, max_idx = int(idx), int(max_idx)
        border = self.data_info['border'][index]
        lq_path = self.data_info['lq_path'][index]

        select_idx = generate_frame_indices(idx, max_idx,
                                            self.opt['num_frame'],
                                            padding=self.opt['padding'])
        if self.cache_data:
            if self.opt['use_duf_downsampling']:
                imgs_lq = self.imgs_gt[folder][select_idx]
                imgs_lq = duf_downsample(imgs_lq, kernel_size=13,
                                         scale=self.opt['scale'])
            else:
                imgs_lq = self.imgs_lq[folder][select_idx]
            img_gt = self.imgs_gt[folder][idx]
        else:
            if self.opt['use_duf_downsampling']:
                img_paths_lq = [self.imgs_gt[folder][i]
                                for i in select_idx]
                imgs_lq = read_img_seq(img_paths_lq, require_mod_crop=True,
                                       scale=self.opt['scale'])
                imgs_lq = duf_downsample(imgs_lq, kernel_size=13,
                                         scale=self.opt['scale'])
            else:
                img_paths_lq = [self.imgs_lq[folder][i]
                                for i in select_idx]
                imgs_lq = read_img_seq(img_paths_lq)
            img_gt = read_img_seq([self.imgs_gt[folder][idx]],
                                  require_mod_crop=True,
                                  scale=self.opt['scale'])[0]

        return {
            'lq': np.asarray(imgs_lq),
            'gt': np.asarray(img_gt),
            'folder': folder,
            'idx': self.data_info['idx'][index],
            'border': border,
            'lq_path': lq_path,
        }


@DATASET_REGISTRY.register()
class VideoRecurrentTestDataset(VideoTestDataset):
    """Whole-clip test set for recurrent models
    (reference video_test_dataset.py:255-292)."""

    def __init__(self, opt):
        super().__init__(opt)
        self.folders = sorted(set(self.data_info['folder']))

    def __getitem__(self, index):
        folder = self.folders[index]
        if self.cache_data:
            imgs_lq = self.imgs_lq[folder]
            imgs_gt = self.imgs_gt[folder]
        else:
            raise NotImplementedError(
                'Without cache_data is not implemented.')
        return {'lq': imgs_lq, 'gt': imgs_gt, 'folder': folder}

    def __len__(self):
        return len(self.folders)
