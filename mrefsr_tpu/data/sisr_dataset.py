"""Plain-SISR views of the MRefSR datasets
(reference basicsr/data/sisr_dataset.py): bicubic (PIL kernel) LR/HR
pairs for MegaDepth/CUFED and the Sun80 / Manga109 / WR-SR / MegaDepth
test sets. NHWC RGB float outputs.
"""
import glob
import os.path as osp
from ast import literal_eval

import cv2
import numpy as np
from PIL import Image

from mrefsr_tpu.utils import img2tensor
from mrefsr_tpu.data.data_util import match_point_crop, ensure_file_client
from mrefsr_tpu.utils.registry import DATASET_REGISTRY

from .data_util import (paired_paths_from_ann_file,
                        paired_paths_from_folder, paired_paths_from_lmdb)
from .transforms import augment, mod_crop


def _pil_bicubic_down(img_rgb01, lq_w, lq_h):
    """PIL-kernel bicubic downsample of an RGB [0,1] float image —
    matches the reference's PIL resize call sites exactly (uint8
    round-trip included)."""
    pil = Image.fromarray((img_rgb01 * 255).astype(np.uint8))
    return np.array(pil.resize((lq_w, lq_h),
                               Image.BICUBIC)).astype(np.float32) / 255.


@DATASET_REGISTRY.register()
class SISRMegaDepthDataset:
    """SISR view of MegaDepth-LMR (reference sisr_dataset.py:22-108):
    crops gt_size around the match point, PIL-bicubic x``scale`` down."""

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
            p0 = np.array(literal_eval(p0))
            self.samples.append((target, p0))

    def __getitem__(self, index):
        scale = self.opt['scale']
        in_path, p0 = self.samples[index]
        img_in = np.array(Image.open(in_path).convert('RGB')).astype(
            np.float32) / 255.
        gt_h = gt_w = self.opt['gt_size']
        img_in = match_point_crop(img_in, p0, gt_h, gt_w)
        img_in = augment(img_in, self.opt['use_flip'], self.opt['use_rot'])
        img_in_lq = _pil_bicubic_down(img_in, gt_w // scale, gt_h // scale)
        img_in, img_in_lq = img2tensor([img_in, img_in_lq], bgr2rgb=False,
                                       float32=True)
        return {'gt': img_in, 'lq': img_in_lq}

    def __len__(self):
        return len(self.samples)


@DATASET_REGISTRY.register()
class SISRCUFEDDataset:
    """SISR view of CUFED pairs (reference sisr_dataset.py:112-236);
    lmdb / ann_file / folder path modes."""

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

    def __getitem__(self, index):
        ensure_file_client(self)
        scale = self.opt['scale']

        in_path = self.paths[index]['in_path']
        img_in = cv2.imdecode(
            np.frombuffer(self.file_client.get(in_path, 'in'), np.uint8),
            cv2.IMREAD_COLOR).astype(np.float32) / 255.
        ref_path = self.paths[index]['ref_path']

        if self.opt['phase'] == 'train':
            gt_h = gt_w = self.opt['gt_size']
            img_in = augment(img_in, self.opt['use_flip'],
                             self.opt['use_rot'])
        else:
            img_in = mod_crop(img_in, scale)
            gt_h, gt_w, _ = img_in.shape

        # BGR float -> RGB PIL bicubic down (reference :211-218)
        img_in_rgb = cv2.cvtColor(img_in, cv2.COLOR_BGR2RGB)
        img_in_lq_rgb = _pil_bicubic_down(img_in_rgb, gt_w // scale,
                                          gt_h // scale)
        img_in_lq = cv2.cvtColor(img_in_lq_rgb, cv2.COLOR_RGB2BGR)

        img_in, img_in_lq = img2tensor([img_in, img_in_lq], bgr2rgb=True,
                                       float32=True)
        # NOTE: faithful to the reference (sisr_dataset.py:227-234),
        # which also returns an EMPTY dict in train phase — upstream
        # this dataset is only ever used for evaluation
        return_dict = {}
        if self.opt['phase'] != 'train':
            return_dict['gt'] = img_in
            return_dict['lq'] = img_in_lq
            return_dict['lq_path'] = ref_path
        return return_dict

    def __len__(self):
        return len(self.paths)


class _GlobSISRTestSet:
    """Shared body of the glob-based SISR test sets
    (reference sisr_dataset.py:240-357)."""

    pattern = '*.png'

    def __init__(self, opt):
        self.opt = opt
        self.input_list = sorted(
            glob.glob(osp.join(opt['dataroot_in'], self.pattern)))

    def __len__(self):
        return len(self.input_list)

    def _load(self, path):
        return cv2.imread(path)

    def __getitem__(self, idx):
        scale = self.opt['scale']
        img_in = self._load(self.input_list[idx])
        ref_path = osp.basename(self.input_list[idx])

        img_in = mod_crop(img_in, scale)
        gt_h, gt_w, _ = img_in.shape
        # NOTE the reference feeds the BGR array to PIL here
        # (sisr_dataset.py:254-255) — replicate exactly
        img_in_lq = Image.fromarray(img_in).resize(
            (gt_w // scale, gt_h // scale), Image.BICUBIC)
        img_in = img_in.astype(np.float32) / 255.
        img_in_lq = np.array(img_in_lq).astype(np.float32) / 255.
        img_in, img_in_lq = img2tensor([img_in, img_in_lq], bgr2rgb=True,
                                       float32=True)
        return {'gt': img_in, 'lq': img_in_lq, 'lq_path': ref_path}


@DATASET_REGISTRY.register()
class SISRSun80Set(_GlobSISRTestSet):
    """(reference sisr_dataset.py:240-277)"""

    def __init__(self, opt):
        self.opt = opt
        self.input_list = sorted(glob.glob(osp.join(
            opt['dataroot_in'], 'Sun_Hays_SR_groundtruth/*.jpg')))


@DATASET_REGISTRY.register()
class SISRManga109Set(_GlobSISRTestSet):
    """(reference sisr_dataset.py:280-317)"""


@DATASET_REGISTRY.register()
class SISRWRSRSet(_GlobSISRTestSet):
    """(reference sisr_dataset.py:320-357)"""


@DATASET_REGISTRY.register()
class SISRMegaDepthTestSet(_GlobSISRTestSet):
    """(reference sisr_dataset.py:360-399)"""

    def __init__(self, opt):
        import pandas as pd
        self.opt = opt
        self.img_folder = osp.join(opt['dataroot_in'], 'test1600Pairs')
        self.pairs_frame = pd.read_csv(
            osp.join(opt['dataroot_in'], 'test1600Pairs.csv'))
        self.input_list = [
            osp.join(self.img_folder, self.pairs_frame.iloc[i, 0])
            for i in range(len(self.pairs_frame))]


@DATASET_REGISTRY.register()
class SISRMegaDepthv3TestSet(_GlobSISRTestSet):
    """(reference sisr_dataset.py:402-443): per-sample subfolders named
    ``xxxxx<name>`` containing the HR image ``<name>``."""

    def __init__(self, opt):
        self.opt = opt
        self.data_folder = opt['data_folder']
        self.folders = sorted(glob.glob(osp.join(self.data_folder, '*')))
        self.input_list = [
            osp.join(folder, osp.basename(folder)[5:])
            for folder in self.folders]

    def __getitem__(self, idx):
        item = super().__getitem__(idx)
        item['lq_path'] = osp.basename(self.folders[idx])
        return item
