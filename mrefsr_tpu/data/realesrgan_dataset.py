"""Real-ESRGAN datasets (reference basicsr/data/realesrgan_dataset.py and
realesrgan_paired_dataset.py).

``RealESRGANDataset`` loads GT images and samples the blur/sinc kernels
on the host loader threads; the two-stage degradation itself runs
on-device inside the model's jitted step (see
``mrefsr_tpu/models/degradation_synth.py``).
"""
import math
import os
import os.path as osp
import random
import time

import cv2
import numpy as np

from mrefsr_tpu.utils import (get_root_logger, imfrombytes,
                              img2tensor)
from mrefsr_tpu.utils.registry import DATASET_REGISTRY
from mrefsr_tpu.data.data_util import ensure_file_client

from .data_util import paired_paths_from_folder, paired_paths_from_lmdb
from .degradations import circular_lowpass_kernel, random_mixed_kernels
from .transforms import augment, paired_random_crop


@DATASET_REGISTRY.register(suffix='basicsr')
class RealESRGANDataset:
    """GT images + per-sample degradation kernels
    (reference realesrgan_dataset.py:18-193)."""

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.gt_folder = opt['dataroot_gt']

        if self.io_backend_opt['type'] == 'lmdb':
            self.io_backend_opt['db_paths'] = [self.gt_folder]
            self.io_backend_opt['client_keys'] = ['gt']
            if not self.gt_folder.endswith('.lmdb'):
                raise ValueError(
                    f"'dataroot_gt' should end with '.lmdb', but received "
                    f'{self.gt_folder}')
            with open(osp.join(self.gt_folder, 'meta_info.txt')) as fin:
                self.paths = [line.split('.')[0] for line in fin]
        elif 'meta_info' in opt and opt['meta_info'] is not None:
            with open(self.opt['meta_info']) as fin:
                paths = [line.strip().split(' ')[0] for line in fin]
                self.paths = [os.path.join(self.gt_folder, v) for v in paths]
        else:
            from mrefsr_tpu.utils.misc import scandir
            self.paths = sorted(
                osp.join(self.gt_folder, v)
                for v in scandir(self.gt_folder))

        # first-stage blur settings (reference :59-66)
        self.blur_kernel_size = opt['blur_kernel_size']
        self.kernel_list = opt['kernel_list']
        self.kernel_prob = opt['kernel_prob']
        self.blur_sigma = opt['blur_sigma']
        self.betag_range = opt['betag_range']
        self.betap_range = opt['betap_range']
        self.sinc_prob = opt['sinc_prob']
        # second-stage blur settings (reference :69-75)
        self.blur_kernel_size2 = opt['blur_kernel_size2']
        self.kernel_list2 = opt['kernel_list2']
        self.kernel_prob2 = opt['kernel_prob2']
        self.blur_sigma2 = opt['blur_sigma2']
        self.betag_range2 = opt['betag_range2']
        self.betap_range2 = opt['betap_range2']
        self.sinc_prob2 = opt['sinc_prob2']
        self.final_sinc_prob = opt['final_sinc_prob']

        self.kernel_range = [2 * v + 1 for v in range(3, 11)]  # 7..21
        self.pulse_tensor = np.zeros((21, 21), np.float32)
        self.pulse_tensor[10, 10] = 1

    def _sample_kernel(self, sinc_prob, kernel_list, kernel_prob, blur_sigma,
                       betag_range, betap_range):
        kernel_size = random.choice(self.kernel_range)
        if np.random.uniform() < sinc_prob:
            # sinc filter setting for kernels in [7, 21] (reference :131-137)
            if kernel_size < 13:
                omega_c = np.random.uniform(np.pi / 3, np.pi)
            else:
                omega_c = np.random.uniform(np.pi / 5, np.pi)
            kernel = circular_lowpass_kernel(omega_c, kernel_size,
                                             pad_to=False)
        else:
            kernel = random_mixed_kernels(
                kernel_list, kernel_prob, kernel_size, blur_sigma,
                blur_sigma, [-math.pi, math.pi], betag_range, betap_range,
                noise_range=None)
        pad_size = (21 - kernel_size) // 2
        return np.pad(kernel,
                      ((pad_size, pad_size), (pad_size, pad_size)))

    def __getitem__(self, index):
        ensure_file_client(self)

        gt_path = self.paths[index]
        retry = 3
        img_bytes = None
        last_err = None
        while retry > 0:
            try:
                img_bytes = self.file_client.get(gt_path, 'gt')
            except (IOError, OSError) as e:
                last_err = e
                logger = get_root_logger()
                logger.warning(f'File client error: {e}, remaining retry '
                               f'times: {retry - 1}')
                # the reference's randint(0, len()) can index one past
                # the end (realesrgan_dataset.py:100) — exclusive bound
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

        img_gt = augment(img_gt, self.opt['use_hflip'], self.opt['use_rot'])

        # crop or pad to crop_pad_size (reference :111-127)
        h, w = img_gt.shape[0:2]
        crop_pad_size = self.opt.get('crop_pad_size', 400)
        if h < crop_pad_size or w < crop_pad_size:
            pad_h = max(0, crop_pad_size - h)
            pad_w = max(0, crop_pad_size - w)
            img_gt = cv2.copyMakeBorder(img_gt, 0, pad_h, 0, pad_w,
                                        cv2.BORDER_REFLECT_101)
        if img_gt.shape[0] > crop_pad_size or img_gt.shape[1] > crop_pad_size:
            h, w = img_gt.shape[0:2]
            top = random.randint(0, h - crop_pad_size)
            left = random.randint(0, w - crop_pad_size)
            img_gt = img_gt[top:top + crop_pad_size,
                            left:left + crop_pad_size, ...]

        kernel = self._sample_kernel(
            self.opt['sinc_prob'], self.kernel_list, self.kernel_prob,
            self.blur_sigma, self.betag_range, self.betap_range)
        kernel2 = self._sample_kernel(
            self.opt['sinc_prob2'], self.kernel_list2, self.kernel_prob2,
            self.blur_sigma2, self.betag_range2, self.betap_range2)

        # final sinc kernel (reference :175-181)
        if np.random.uniform() < self.final_sinc_prob:
            kernel_size = random.choice(self.kernel_range)
            omega_c = np.random.uniform(np.pi / 3, np.pi)
            sinc_kernel = circular_lowpass_kernel(omega_c, kernel_size,
                                                  pad_to=21)
        else:
            sinc_kernel = self.pulse_tensor

        img_gt = img2tensor([img_gt], bgr2rgb=True, float32=True)[0]
        return {'gt': img_gt, 'kernel1': kernel.astype(np.float32),
                'kernel2': kernel2.astype(np.float32),
                'sinc_kernel': sinc_kernel.astype(np.float32),
                'gt_path': gt_path}

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register(suffix='basicsr')
class RealESRGANPairedDataset:
    """Paired LQ/GT dataset with lmdb / meta_info / folder modes
    (reference realesrgan_paired_dataset.py:12-106)."""

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.mean = opt.get('mean')
        self.std = opt.get('std')

        self.gt_folder, self.lq_folder = opt['dataroot_gt'], opt[
            'dataroot_lq']
        self.filename_tmpl = opt.get('filename_tmpl', '{}')

        if self.io_backend_opt['type'] == 'lmdb':
            self.io_backend_opt['db_paths'] = [self.lq_folder,
                                               self.gt_folder]
            self.io_backend_opt['client_keys'] = ['lq', 'gt']
            self.paths = paired_paths_from_lmdb(
                [self.lq_folder, self.gt_folder], ['lq', 'gt'])
        elif 'meta_info' in self.opt and self.opt['meta_info'] is not None:
            with open(self.opt['meta_info']) as fin:
                paths = [line.strip() for line in fin]
            self.paths = []
            for path in paths:
                gt_path, lq_path = path.split(', ')
                gt_path = os.path.join(self.gt_folder, gt_path)
                lq_path = os.path.join(self.lq_folder, lq_path)
                self.paths.append({'gt_path': gt_path, 'lq_path': lq_path})
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
