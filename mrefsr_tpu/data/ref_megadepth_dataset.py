"""Single-reference MegaDepth datasets
(reference basicsr/data/ref_megadepth_dataset.py). RGB (PIL-loaded)
float outputs with the reference's PIL-bicubic LR/UP chain; hardcoded
test-scene split.
"""
import os.path as osp
from ast import literal_eval

import numpy as np
from PIL import Image

from mrefsr_tpu.utils import img2tensor
from mrefsr_tpu.utils.registry import DATASET_REGISTRY
from mrefsr_tpu.data.data_util import match_point_crop

from .multi_ref_dataset import _impad_to
from .ref_cufed_dataset import image_pair_generation_perspective
from .transforms import augment, mod_crop

TEST_SCENES = ['0000', '0003', '0004', '0008', '0013', '0017', '0019',
               '0021', '0024', '0032', '0048', '0050', '0063', '0078',
               '0380', '1589', '5009', '5010', '5012']


def _rgb_lq_up(img01, lq_w, lq_h, gt_w, gt_h):
    pil = Image.fromarray((img01 * 255).astype(np.uint8))
    lq = pil.resize((lq_w, lq_h), Image.BICUBIC)
    up = lq.resize((gt_w, gt_h), Image.BICUBIC)
    return (np.array(lq).astype(np.float32) / 255.,
            np.array(up).astype(np.float32) / 255.)


@DATASET_REGISTRY.register()
class RefMegaDepthDataset:
    """Single-ref MegaDepth with match-point crops
    (reference ref_megadepth_dataset.py:16-190)."""

    def __init__(self, opt):
        self.opt = opt
        self.in_folder = opt['dataroot_in']
        self.ref_folder = opt['dataroot_ref']
        self.ann_file = opt['ann_file']
        self.load_annotations()

    def load_annotations(self):
        """CSV rows: target, reference, scene, similarity, point lists;
        rows from the first 'L'-similarity row on are dropped and the
        test-scene split is hardcoded (reference :43-70)."""
        import pandas as pd
        self.samples = []
        df = pd.read_csv(self.ann_file, dtype={'scene': 'string'})
        for i in range(len(df)):
            target, reference, scene, sim, p_a, p_b = df.loc[i].tolist()
            if sim == 'L':
                break
            if self.opt['phase'] == 'train':
                if scene in TEST_SCENES:
                    continue
                p_a = np.array(literal_eval(p_a))
                p_b = np.array(literal_eval(p_b))
                for xy_a, xy_b in zip(p_a, p_b):
                    self.samples.append(
                        (osp.join(self.in_folder, scene, target),
                         osp.join(self.in_folder, scene, reference),
                         xy_a, xy_b))
            else:
                if scene not in TEST_SCENES:
                    continue
                self.samples.append(
                    (osp.join(self.in_folder, scene, target),
                     osp.join(self.in_folder, scene, reference),
                     (-1, -1), (-1, -1)))

    def _load_pair(self, index):
        in_path, ref_path, (x_a, y_a), (x_b, y_b) = self.samples[index]
        img_in = np.array(Image.open(in_path).convert('RGB')).astype(
            np.float32) / 255.
        img_ref = np.array(Image.open(ref_path).convert('RGB')).astype(
            np.float32) / 255.
        return img_in, img_ref, (x_a, y_a), (x_b, y_b), ref_path

    def _train_crop(self, img_in, img_ref, pt_a, pt_b):
        gt_h = gt_w = self.opt['gt_size']
        x_a, y_a = pt_a
        x_b, y_b = pt_b
        img_in = match_point_crop(img_in, (x_a, y_a), gt_h, gt_w)
        img_ref = match_point_crop(img_ref, (x_b, y_b), gt_h, gt_w)
        return augment([img_in, img_ref], self.opt['use_flip'],
                       self.opt['use_rot'])

    def _pack(self, img_in, img_ref, gt_h, gt_w, scale):
        lq_h, lq_w = gt_h // scale, gt_w // scale
        img_in_lq, img_in_up = _rgb_lq_up(img_in, lq_w, lq_h, gt_w, gt_h)
        img_ref_lq, img_ref_up = _rgb_lq_up(img_ref, lq_w, lq_h, gt_w,
                                            gt_h)
        tensors = img2tensor(
            [img_in, img_in_lq, img_in_up, img_ref, img_ref_lq,
             img_ref_up], bgr2rgb=False, float32=True)
        keys = ('img_in', 'img_in_lq', 'img_in_up', 'img_ref',
                'img_ref_lq', 'img_ref_up')
        return dict(zip(keys, tensors))

    def __getitem__(self, index):
        scale = self.opt['scale']
        img_in, img_ref, pt_a, pt_b, ref_path = self._load_pair(index)

        if self.opt['phase'] == 'train':
            img_in, img_ref = self._train_crop(img_in, img_ref, pt_a,
                                               pt_b)
            gt_h = gt_w = self.opt['gt_size']
            return self._pack(img_in, img_ref, gt_h, gt_w, scale)

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
        gt_h, gt_w, _ = img_in.shape
        return_dict = self._pack(img_in, img_ref, gt_h, gt_w, scale)
        return_dict['img_in'] = img2tensor(img_in_gt, bgr2rgb=False,
                                           float32=True)
        return_dict['lq_path'] = ref_path
        return_dict['padding'] = padding
        return_dict['original_size'] = (img_in_h, img_in_w)
        return return_dict

    def __len__(self):
        return len(self.samples)


@DATASET_REGISTRY.register()
class RefMegaDepthCVTDataset(RefMegaDepthDataset):
    """CVT variant: adds homography-warped ref during training
    (reference ref_megadepth_dataset.py:247-367)."""

    def __getitem__(self, index):
        if self.opt['phase'] != 'train':
            return super().__getitem__(index)
        scale = self.opt['scale']
        img_in, img_ref, pt_a, pt_b, _ = self._load_pair(index)
        img_in, img_ref = self._train_crop(img_in, img_ref, pt_a, pt_b)
        gt_h = gt_w = self.opt['gt_size']
        img_ref_hrp, _, _ = image_pair_generation_perspective(
            (img_ref * 255).astype(np.uint8),
            random_perturb_range=(5, 20), dsize=(gt_h, gt_w))
        img_ref_hrp = img_ref_hrp.astype(np.float32) / 255.

        return_dict = self._pack(img_in, img_ref, gt_h, gt_w, scale)
        lq_h, lq_w = gt_h // scale, gt_w // scale
        hrp_lq, hrp_up = _rgb_lq_up(img_ref_hrp, lq_w, lq_h, gt_w, gt_h)
        (return_dict['img_ref_hrp'], return_dict['img_ref_hrp_lq'],
         return_dict['img_ref_hrp_up']) = img2tensor(
            [img_ref_hrp, hrp_lq, hrp_up], bgr2rgb=False, float32=True)
        return return_dict


@DATASET_REGISTRY.register()
class SingleRefMegaDepthDataset:
    """5-ref CSV but a random single ref per sample
    (reference basicsr/data/single_ref_dataset.py:20-123)."""

    def __init__(self, opt):
        self.opt = opt
        self.in_folder = opt['dataroot_in']
        self.ref_folder = opt['dataroot_ref']
        self.ann_file = opt['ann_file']
        self.load_annotations()

    def load_annotations(self):
        import pandas as pd
        self.samples = []
        df = pd.read_csv(self.ann_file, dtype={'scene': 'string'})
        for i in range(len(df)):
            (target, h, m1, m2, l1, l2, p0, p1, p2, p3, p4, p5,
             scene) = df.loc[i].tolist()
            target = osp.join(self.in_folder, scene, target)
            references = [osp.join(self.in_folder, scene, name)
                          for name in (h, m1, m2, l1, l2)]
            p0 = np.array(literal_eval(p0))
            p_refs = [np.array(literal_eval(p)) for p in
                      (p1, p2, p3, p4, p5)]
            self.samples.append((target, references, p0, p_refs))

    def __getitem__(self, index):
        scale = self.opt['scale']
        in_path, ref_paths, p0, p_refs = self.samples[index]
        perm = np.random.permutation(5)
        img_in = np.array(Image.open(in_path).convert('RGB')).astype(
            np.float32) / 255.
        img_ref = np.array(
            Image.open(ref_paths[perm[0]]).convert('RGB')).astype(
                np.float32) / 255.

        gt_h = gt_w = self.opt['gt_size']
        img_in = match_point_crop(img_in, p0, gt_h, gt_w)
        pr = p_refs[perm[0]]
        img_ref = match_point_crop(img_ref, pr, gt_h, gt_w)
        img_in, img_ref = augment([img_in, img_ref],
                                  self.opt['use_flip'],
                                  self.opt['use_rot'])

        lq_h, lq_w = gt_h // scale, gt_w // scale
        img_in_lq, img_in_up = _rgb_lq_up(img_in, lq_w, lq_h, gt_w, gt_h)
        img_ref_lq, img_ref_up = _rgb_lq_up(img_ref, lq_w, lq_h, gt_w,
                                            gt_h)
        tensors = img2tensor(
            [img_in, img_in_lq, img_in_up, img_ref, img_ref_lq,
             img_ref_up], bgr2rgb=False, float32=True)
        keys = ('img_in', 'img_in_lq', 'img_in_up', 'img_ref',
                'img_ref_lq', 'img_ref_up')
        return dict(zip(keys, tensors))

    def __len__(self):
        return len(self.samples)
