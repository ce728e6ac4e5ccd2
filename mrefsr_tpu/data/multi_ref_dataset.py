"""Multi-reference datasets (LMR / CUFED5).

Behavioral rebuild of reference basicsr/data/multi_ref_dataset.py:
MultiRefMegaDepthDataset (CSV annotation, 5 similarity-tier refs with
match-point crops, PIL-bicubic x4 down/up pairs) and MultiRefCUFEDSet
(CUFED5 eval, everything zero-padded to 500x500 so eval shapes are
static — a TPU win). Images are HWC RGB float32 numpy; refs are stacked
on a leading T axis.
"""
import glob
import os.path as osp
import random
from ast import literal_eval

import numpy as np
from PIL import Image

from mrefsr_tpu.data.transforms import augment, mod_crop
from mrefsr_tpu.utils import img2tensor
from mrefsr_tpu.utils.registry import DATASET_REGISTRY
from mrefsr_tpu.data.data_util import match_point_crop


def _impad_to(img, shape, pad_val=0):
    """Zero-pad bottom/right to a target (h, w) (mmcv.impad equivalent,
    used at reference multi_ref_dataset.py:175-180). A dimension larger
    than the target is top-left-cropped first — only reachable with
    bucketed ``pad_to`` canvases, where a reference image may exceed
    the bucket its (smaller) input selected."""
    img = img[:shape[0], :shape[1]]
    h, w = img.shape[:2]
    ph, pw = shape[0] - h, shape[1] - w
    return np.pad(img, ((0, ph), (0, pw), (0, 0)), constant_values=pad_val)


def _pil_down_up_u8(img_u8, scale):
    """uint8 PIL bicubic down x scale and back up (uint8 in/out)."""
    h, w = img_u8.shape[:2]
    lq_h, lq_w = h // scale, w // scale
    pil = Image.fromarray(img_u8)
    lq = pil.resize((lq_w, lq_h), Image.BICUBIC)
    up = lq.resize((w, h), Image.BICUBIC)
    return np.array(lq), np.array(up)


def _pil_down_up(img01, scale):
    """uint8-quantized PIL bicubic down x scale and back up — the exact
    degradation at reference multi_ref_dataset.py:93-113."""
    lq, up = _pil_down_up_u8((img01 * 255).astype(np.uint8), scale)
    return lq.astype(np.float32) / 255., up.astype(np.float32) / 255.


@DATASET_REGISTRY.register()
class MultiRefMegaDepthDataset:
    """5-reference MegaDepth training set
    (reference multi_ref_dataset.py:20-139).

    Returns: img_in (H,W,3), img_in_lq (H/4,W/4,3), img_in_up (H,W,3),
    img_ref_list (5,H,W,3), img_ref_lq_list, img_ref_up_list — all RGB
    float32.
    """

    def __init__(self, opt):
        self.opt = opt
        self.in_folder = opt['dataroot_in']
        self.ref_folder = opt['dataroot_ref']
        self.ann_file = opt['ann_file']
        self.load_annotations()
        # Opt-in decoded-image LRU cache (``decode_cache_size``: max
        # FULL decoded uint8 images kept). The host input pipeline is
        # decode-bound (6 full JPEG decodes per sample) and every image
        # is re-read ~dataset_enlarge_ratio times per epoch, so a cache
        # sized to the working set removes nearly all decode cost.
        # ~3 MB per 1-MP image; size to available host RAM.
        self._cache_size = int(opt.get('decode_cache_size', 0))
        if self._cache_size:
            import collections
            import threading
            self._cache = collections.OrderedDict()
            self._cache_lock = threading.Lock()

    def _load_u8(self, path):
        """Decode to uint8 RGB (through the LRU cache when enabled)."""
        if not self._cache_size:
            return np.array(Image.open(path).convert('RGB'))
        with self._cache_lock:
            img = self._cache.get(path)
            if img is not None:
                self._cache.move_to_end(path)
                return img
        img = np.array(Image.open(path).convert('RGB'))
        img.setflags(write=False)
        with self._cache_lock:
            self._cache[path] = img
            self._cache.move_to_end(path)
            while len(self._cache) > self._cache_size:
                self._cache.popitem(last=False)
        return img

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

        # Decode to uint8 and crop BEFORE the float32 conversion: the
        # f32 copy of six full ~1-MP images costs more host time than
        # the JPEG decodes themselves, and /255. after the crop is
        # bit-identical (measured: 93 -> ~62 ms/sample single-core).
        gt_h = gt_w = self.opt['gt_size']
        img_in = match_point_crop(self._load_u8(in_path), p0, gt_h, gt_w)
        refs = [match_point_crop(self._load_u8(p), pt, gt_h, gt_w)
                for p, pt in zip(ref_paths, p_refs)]
        random.shuffle(refs)

        # the whole pipeline to this point is uint8 (decode, crop,
        # flip/rot, PIL resampling all operate on uint8), so with
        # ``output_dtype: uint8`` samples ship as uint8 and the /255.
        # float conversion moves to the DEVICE (DevicePrefetcher):
        # exactly the same values (u8/255 is exact in f32) with 4x
        # fewer host->device bytes and no host-side float copies.
        u8_out = self.opt.get('output_dtype') == 'uint8'

        imgs = augment([img_in] + refs, self.opt['use_flip'],
                       self.opt['use_rot'])
        img_in, refs = imgs[0], imgs[1:]

        img_in_lq, img_in_up = _pil_down_up_u8(img_in, scale)
        refs_lq, refs_up = [], []
        for r in refs:
            lq, up = _pil_down_up_u8(r, scale)
            refs_lq.append(lq)
            refs_up.append(up)

        def out(img):
            img = np.ascontiguousarray(img)
            return img if u8_out else img.astype(np.float32) / 255.

        return {
            'img_in': out(img_in),
            'img_in_lq': out(img_in_lq),
            'img_in_up': out(img_in_up),
            'img_ref_list': np.stack([out(r) for r in refs]),
            'img_ref_lq_list': np.stack([out(r) for r in refs_lq]),
            'img_ref_up_list': np.stack([out(r) for r in refs_up]),
        }

    def __len__(self):
        return len(self.samples)


@DATASET_REGISTRY.register()
class MultiRefCUFEDSet:
    """CUFED5 5-reference eval set
    (reference multi_ref_dataset.py:143-227): input ``*_0.png``, refs
    ``*_1..5.png``, mod-cropped, zero-padded to 500x500 with
    ``padding``/``original_size`` so validation can un-pad.

    ``pad_to`` (default 500, the reference protocol) sets the padded
    canvas. A list (e.g. ``pad_to: [300, 400, 500]``) enables bucketed
    serving: each image pads each dimension to the smallest listed
    bucket it fits (rectangular canvases — CUFED5 images are mostly
    ~500x332, so per-dimension buckets drop ~30% of the padded area
    where square ones win nothing), trading a bounded number of
    compiled eval graphs (at most len(buckets)^2, one per canvas
    actually used) for far less wasted compute. Buckets are a serving
    knob only; the +-0.05 dB parity gate keeps the reference's single
    500 canvas (padding extent perturbs patch matching near borders)."""

    def __init__(self, opt):
        import cv2
        self.cv2 = cv2
        self.opt = opt
        pad_opt = opt.get('pad_to', 500)
        if isinstance(pad_opt, (list, tuple)):
            self.pad_buckets = sorted(int(v) for v in pad_opt)
        else:
            self.pad_buckets = [int(pad_opt)]
        scale = int(opt.get('scale', 4))
        for b in self.pad_buckets:
            if b % scale:
                raise ValueError(
                    f'pad_to canvas {b} must be divisible by scale '
                    f'{scale} (the LQ canvas is pad_to/scale)')
        root_in, root_ref = opt['dataroot_in'], opt['dataroot_ref']
        self.input_list = sorted(glob.glob(osp.join(root_in, '*_0.png')))
        self.ref_lists = [
            sorted(glob.glob(osp.join(root_ref, f'*_{i}.png')))
            for i in range(1, 6)
        ]

    def __len__(self):
        return len(self.input_list)

    def __getitem__(self, idx):
        cv2 = self.cv2
        scale = self.opt['scale']

        img_in = cv2.imread(self.input_list[idx])
        refs = [cv2.imread(lst[idx]) for lst in self.ref_lists]
        ref_path = self.ref_lists[0][idx].replace('_1.png', '_multi.png')

        img_in = mod_crop(img_in, scale)
        img_in_gt = img_in.copy()
        img_in_h, img_in_w = img_in.shape[:2]

        # smallest bucket each mod-cropped input DIMENSION fits (refs
        # are padded or cropped to the same canvas, as the reference
        # does at 500). Per-dimension selection matters: CUFED5 images
        # are mostly ~500x332, so a square bucket set degenerates to
        # the full 500 canvas while rectangular buckets drop ~30% of
        # the padded area (compile count is bounded by len(buckets)^2).
        gt_h = next((b for b in self.pad_buckets if b >= img_in_h),
                    self.pad_buckets[-1])
        gt_w = next((b for b in self.pad_buckets if b >= img_in_w),
                    self.pad_buckets[-1])
        img_in = _impad_to(img_in, (gt_h, gt_w))
        refs = [_impad_to(r, (gt_h, gt_w)) for r in refs]

        # PIL bicubic down/up on the padded uint8 BGR arrays (reference
        # :183-193 resizes before the /255 normalization)
        lq_h, lq_w = gt_h // scale, gt_w // scale
        img_in_lq = Image.fromarray(img_in).resize((lq_w, lq_h),
                                                   Image.BICUBIC)
        img_in_up = img_in_lq.resize((gt_w, gt_h), Image.BICUBIC)
        refs_lq, refs_up = [], []
        for r in refs:
            rl = Image.fromarray(r).resize((lq_w, lq_h), Image.BICUBIC)
            refs_lq.append(rl)
            refs_up.append(rl.resize((gt_w, gt_h), Image.BICUBIC))

        to01 = lambda a: np.array(a).astype(np.float32) / 255.  # noqa
        img_in = to01(img_in)
        img_in_gt = to01(img_in_gt)
        img_in_lq = to01(img_in_lq)
        img_in_up = to01(img_in_up)
        refs = [to01(r) for r in refs]
        refs_lq = [to01(r) for r in refs_lq]
        refs_up = [to01(r) for r in refs_up]

        # BGR -> RGB
        img_in, img_in_lq, img_in_up, img_in_gt = img2tensor(
            [img_in, img_in_lq, img_in_up, img_in_gt], bgr2rgb=True,
            float32=True)
        refs = np.stack(img2tensor(refs, bgr2rgb=True, float32=True))
        refs_lq = np.stack(img2tensor(refs_lq, bgr2rgb=True, float32=True))
        refs_up = np.stack(img2tensor(refs_up, bgr2rgb=True, float32=True))

        return {
            'img_in': img_in_gt,
            'img_in_lq': img_in_lq,
            'img_in_up': img_in_up,
            'img_ref_list': refs,
            'img_ref_lq_list': refs_lq,
            'img_ref_up_list': refs_up,
            'lq_path': ref_path,
            'padding': True,
            'original_size': (img_in_h, img_in_w),
        }
