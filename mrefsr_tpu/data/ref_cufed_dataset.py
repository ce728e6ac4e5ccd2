"""Single-reference CUFED datasets
(reference basicsr/data/ref_cufed_dataset.py). NHWC RGB float outputs
with the reference's exact PIL-bicubic LR/UP chain.
"""
import cv2
import numpy as np
from PIL import Image

from mrefsr_tpu.utils import img2tensor
from mrefsr_tpu.data.data_util import ensure_file_client
from mrefsr_tpu.utils.registry import DATASET_REGISTRY

from .data_util import (paired_paths_from_ann_file,
                        paired_paths_from_folder, paired_paths_from_lmdb)
from .multi_ref_dataset import _impad_to
from .transforms import augment, mod_crop


def _bgr_to_pil(img01):
    return Image.fromarray(
        cv2.cvtColor((img01 * 255).astype(np.uint8), cv2.COLOR_BGR2RGB))


def _pil_to_bgr(pil):
    return cv2.cvtColor(np.array(pil),
                        cv2.COLOR_RGB2BGR).astype(np.float32) / 255.


def _lq_up_chain(img_bgr01, lq_w, lq_h, gt_w, gt_h):
    """PIL bicubic down then back up (reference ref_cufed_dataset.py
    :136-162): returns (lq, up) BGR [0,1]."""
    pil = _bgr_to_pil(img_bgr01)
    lq = pil.resize((lq_w, lq_h), Image.BICUBIC)
    up = lq.resize((gt_w, gt_h), Image.BICUBIC)
    return _pil_to_bgr(lq), _pil_to_bgr(up)


def image_pair_generation_perspective(img, random_perturb_range=(0, 32),
                                      cropping_window_size=160,
                                      dsize=None):
    """Random homography warp pair (reference ref_cufed_dataset.py
    :190-273): perturb the four corners of a crop window, warp with the
    inverse homography."""
    if img is not None:
        h, w = img.shape[:2]
    else:
        h = w = 160

    crop = cropping_window_size
    x_tl = np.random.randint(random_perturb_range[1],
                             max(w, w - crop - random_perturb_range[1]))
    y_tl = np.random.randint(random_perturb_range[1],
                             max(h, h - crop - random_perturb_range[1]))
    rect1 = np.array([(x_tl, y_tl), (x_tl + crop, y_tl),
                      (x_tl + crop, y_tl + crop), (x_tl, y_tl + crop)],
                     dtype=np.float32)

    def perturb(v):
        return v + np.random.randint(*random_perturb_range) * \
            np.random.choice([-1.0, 1.0])

    rect2 = np.array([(perturb(x), perturb(y)) for x, y in rect1],
                     dtype=np.float32)

    homography = cv2.getPerspectiveTransform(src=rect1, dst=rect2)
    h_inverse = np.linalg.inv(homography)
    if img is not None:
        if dsize is None:
            dsize = (w, h)
        img_warped = cv2.warpPerspective(src=img, M=h_inverse, dsize=dsize,
                                         flags=cv2.INTER_CUBIC)
        return img_warped, homography, h_inverse
    return h_inverse


@DATASET_REGISTRY.register()
class RefCUFEDDataset:
    """Single-ref CUFED pairs, lmdb / ann_file / folder modes
    (reference ref_cufed_dataset.py:16-187)."""

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.in_folder = opt['dataroot_in']
        self.ref_folder = opt['dataroot_ref']
        self.filename_tmpl = opt.get('filename_tmpl', '{}')

        if self.io_backend_opt['type'] == 'lmdb':
            self.io_backend_opt['db_paths'] = [self.in_folder,
                                               self.ref_folder]
            self.io_backend_opt['client_keys'] = ['in', 'ref']
            self.paths = paired_paths_from_lmdb(
                [self.in_folder, self.ref_folder], ['in', 'ref'])
        elif 'ann_file' in self.opt:
            self.paths = paired_paths_from_ann_file(
                [self.in_folder, self.ref_folder], ['in', 'ref'],
                self.opt['ann_file'])
        else:
            self.paths = paired_paths_from_folder(
                [self.in_folder, self.ref_folder], ['in', 'ref'],
                self.filename_tmpl)

    def _load_pair(self, index):
        ensure_file_client(self)
        in_path = self.paths[index]['in_path']
        img_in = cv2.imdecode(
            np.frombuffer(self.file_client.get(in_path, 'in'), np.uint8),
            cv2.IMREAD_COLOR).astype(np.float32) / 255.
        ref_path = self.paths[index]['ref_path']
        img_ref = cv2.imdecode(
            np.frombuffer(self.file_client.get(ref_path, 'ref'),
                          np.uint8),
            cv2.IMREAD_COLOR).astype(np.float32) / 255.
        return img_in, img_ref, ref_path

    def _train_pair(self, img_in, img_ref):
        """Resize the ref to gt_size (PIL) + flip/rot augmentation
        (reference :95-105)."""
        gt_h = gt_w = self.opt['gt_size']
        img_ref = _pil_to_bgr(
            _bgr_to_pil(img_ref).resize((gt_w, gt_h), Image.BICUBIC))
        img_in, img_ref = augment([img_in, img_ref],
                                  self.opt['use_flip'],
                                  self.opt['use_rot'])
        return img_in, img_ref, gt_h, gt_w

    def _test_pair(self, img_in, img_ref, scale):
        """mod_crop + zero-pad to a common size (reference :107-125)."""
        img_in = mod_crop(img_in, scale)
        img_in_gt = img_in.copy()
        img_ref = mod_crop(img_ref, scale)
        img_in_h, img_in_w, _ = img_in.shape
        img_ref_h, img_ref_w, _ = img_ref.shape
        padding = False
        if img_in_h != img_ref_h or img_in_w != img_ref_w:
            padding = True
            target_h = max(img_in_h, img_ref_h)
            target_w = max(img_in_w, img_ref_w)
            img_in = _impad_to(img_in, (target_h, target_w))
            img_ref = _impad_to(img_ref, (target_h, target_w))
        return (img_in, img_in_gt, img_ref, padding,
                (img_in_h, img_in_w))

    def _pack(self, img_in, img_ref, gt_h, gt_w, scale):
        lq_h, lq_w = gt_h // scale, gt_w // scale
        img_in_lq, img_in_up = _lq_up_chain(img_in, lq_w, lq_h, gt_w, gt_h)
        img_ref_lq, img_ref_up = _lq_up_chain(img_ref, lq_w, lq_h, gt_w,
                                              gt_h)
        tensors = img2tensor(
            [img_in, img_in_lq, img_in_up, img_ref, img_ref_lq,
             img_ref_up], bgr2rgb=True, float32=True)
        keys = ('img_in', 'img_in_lq', 'img_in_up', 'img_ref',
                'img_ref_lq', 'img_ref_up')
        return dict(zip(keys, tensors))

    def __getitem__(self, index):
        scale = self.opt['scale']
        img_in, img_ref, ref_path = self._load_pair(index)

        if self.opt['phase'] == 'train':
            img_in, img_ref, gt_h, gt_w = self._train_pair(img_in, img_ref)
            return self._pack(img_in, img_ref, gt_h, gt_w, scale)

        (img_in, img_in_gt, img_ref, padding,
         original_size) = self._test_pair(img_in, img_ref, scale)
        gt_h, gt_w, _ = img_in.shape
        return_dict = self._pack(img_in, img_ref, gt_h, gt_w, scale)
        return_dict['img_in'] = img2tensor(img_in_gt, bgr2rgb=True,
                                           float32=True)
        return_dict['lq_path'] = ref_path
        return_dict['padding'] = padding
        return_dict['original_size'] = original_size
        return return_dict

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register()
class RefCUFEDCVTDataset(RefCUFEDDataset):
    """CVT variant: adds a homography-warped ref pair during training
    (reference ref_cufed_dataset.py:276-412)."""

    def __getitem__(self, index):
        scale = self.opt['scale']
        img_in, img_ref, ref_path = self._load_pair(index)

        if self.opt['phase'] != 'train':
            return super().__getitem__(index)

        img_in, img_ref, gt_h, gt_w = self._train_pair(img_in, img_ref)
        img_ref_hrp, _, _ = image_pair_generation_perspective(
            (img_ref * 255).astype(np.uint8),
            random_perturb_range=(5, 20), dsize=(160, 160))
        img_ref_hrp = img_ref_hrp.astype(np.float32) / 255.

        return_dict = self._pack(img_in, img_ref, gt_h, gt_w, scale)
        lq_h, lq_w = gt_h // scale, gt_w // scale
        hrp_lq, hrp_up = _lq_up_chain(img_ref_hrp, lq_w, lq_h, gt_w, gt_h)
        (return_dict['img_ref_hrp'], return_dict['img_ref_hrp_lq'],
         return_dict['img_ref_hrp_up']) = img2tensor(
            [img_ref_hrp, hrp_lq, hrp_up], bgr2rgb=True, float32=True)
        return return_dict
