"""On-device two-stage Real-ESRGAN degradation pipeline, TPU-native.

Rebuild of the synthesis block in reference
basicsr/models/realesrgan_model.py:69-186 / realesrnet_model.py:68-189.

The reference resizes by a random fractional scale each step
(``F.interpolate(scale_factor=np.random.uniform(...))``), giving every
step a different intermediate tensor shape — fine for eager CUDA, fatal
for XLA (one recompile per shape). The TPU-native redesign keeps ONE
compiled graph:

* All random *decisions* (resize scale + mode, noise family, blur/order
  coin flips) are drawn on the host each step, exactly as the reference
  draws them, but they enter the graph as **data**, not shapes.
* Each random resize becomes two dense matmuls with host-built
  torch-parity resampling matrices (`ops.resize.resize_matrix_np`)
  onto a FIXED canvas; the image occupies the top-left (h, w) valid
  region and the rest of the canvas is reflect-extended / zero-masked
  as each op requires. Resampling rides the MXU.
* Canvas JPEG equals reference JPEG exactly: the canvas is a multiple
  of 16 and the invalid region is zeroed first, so every 8x8 DCT block
  matches the reference's zero-padded blocks.
* Boolean branches (gaussian-vs-poisson, second blur, jpeg/resize
  order) are `lax.cond`s — both branches compile once, only the taken
  one executes.

The per-step host->device traffic is a handful of small resize
matrices (< 1 MB), amortized against zero recompiles.
"""
import math
import random

import jax
import jax.numpy as jnp
import numpy as np

from mrefsr_tpu.data.degradations import (random_add_gaussian_noise_jax,
                                          random_add_poisson_noise_jax)
from mrefsr_tpu.ops.resize import resize_matrix_np
from mrefsr_tpu.utils.diffjpeg import DiffJPEG
from mrefsr_tpu.utils.img_process_util import USMSharp, filter2D

MODES = ('area', 'bilinear', 'bicubic')


def _round16(x):
    return int(math.ceil(x / 16) * 16)


def _embed(mat, rows, cols):
    out = np.zeros((rows, cols), np.float32)
    out[:mat.shape[0], :mat.shape[1]] = mat
    return out


def _reflect_extend(x, h_valid, w_valid):
    """Extend the valid (h,w) top-left region over the whole canvas by
    reflection (border-101) so windowed ops see the same neighborhood
    the reference sees at the true image boundary."""
    ch, cw = x.shape[1], x.shape[2]
    i = jnp.arange(ch)
    idx_h = jnp.where(i < h_valid, i,
                      jnp.clip(2 * h_valid - 2 - i, 0, h_valid - 1))
    j = jnp.arange(cw)
    idx_w = jnp.where(j < w_valid, j,
                      jnp.clip(2 * w_valid - 2 - j, 0, w_valid - 1))
    return x[:, idx_h][:, :, idx_w]


def _valid_mask(shape_hw, h_valid, w_valid, dtype=jnp.float32):
    mh = (jnp.arange(shape_hw[0]) < h_valid).astype(dtype)
    mw = (jnp.arange(shape_hw[1]) < w_valid).astype(dtype)
    return (mh[:, None] * mw[None, :])[None, :, :, None]


class DegradationSynthesizer:
    """Callable realizing feed_data's synthesis
    (reference realesrgan_model.py:69-186). One instance per model."""

    def __init__(self, opt):
        self.opt = opt
        self.scale = opt['scale']
        self.jpeger = DiffJPEG(differentiable=False)
        self.usm = USMSharp()
        self._jit_synth = jax.jit(
            self._synth,
            static_argnames=('gt_hw', 'c1', 'c2', 'usm_source'))

    # ------------------------------------------------------------ host RNG
    def _draw_resize(self, prob, rng_range):
        updown_type = random.choices(['up', 'down', 'keep'], prob)[0]
        if updown_type == 'up':
            scale = np.random.uniform(1, rng_range[1])
        elif updown_type == 'down':
            scale = np.random.uniform(rng_range[0], 1)
        else:
            scale = 1
        mode = random.choice(MODES)
        return scale, mode

    def __call__(self, key, gt, kernel1, kernel2, sinc_kernel,
                 usm_source=True):
        """gt: (b, H, W, 3) RGB [0,1] device array. Returns (gt_usm, lq)
        with lq of shape (b, H/scale, W/scale, 3). Cropping to gt_size
        happens in the caller (after the pair pool), as in the
        reference (:172-176).

        usm_source: degrade from usm(gt) — the RealESRGAN model's
        behavior (reference realesrgan_model.py:183,86 degrades from
        self.gt_usm unconditionally). RealESRNet passes False: the
        reference realesrnet_model.py:86 degrades from self.gt, which
        feed_data has already sharpened iff ``gt_usm: true``."""
        opt = self.opt
        H, W = int(gt.shape[1]), int(gt.shape[2])
        lqh, lqw = H // self.scale, W // self.scale

        # --- host draws, same order/semantics as reference :88-166
        s1, mode1 = self._draw_resize(opt['resize_prob'],
                                      opt['resize_range'])
        noise1_gaussian = np.random.uniform() < opt['gaussian_noise_prob']
        second_blur = np.random.uniform() < opt['second_blur_prob']
        s2, mode2 = self._draw_resize(opt['resize_prob2'],
                                      opt['resize_range2'])
        noise2_gaussian = np.random.uniform() < opt['gaussian_noise_prob2']
        resize_first = np.random.uniform() < 0.5
        mode3 = random.choice(MODES)

        h1, w1 = max(int(H * s1), 1), max(int(W * s1), 1)
        h2 = max(int(H / self.scale * s2), 1)
        w2 = max(int(W / self.scale * s2), 1)

        c1h = _round16(H * max(opt['resize_range'][1], 1))
        c1w = _round16(W * max(opt['resize_range'][1], 1))
        c2h = _round16(H / self.scale * max(opt['resize_range2'][1], 1))
        c2w = _round16(W / self.scale * max(opt['resize_range2'][1], 1))

        a1h = _embed(resize_matrix_np(H, h1, mode1), c1h, H)
        a1w = _embed(resize_matrix_np(W, w1, mode1), c1w, W)
        a2h = _embed(resize_matrix_np(h1, h2, mode2), c2h, c1h)
        a2w = _embed(resize_matrix_np(w1, w2, mode2), c2w, c1w)
        a3h = _embed(resize_matrix_np(h2, lqh, mode3), lqh, c2h)
        a3w = _embed(resize_matrix_np(w2, lqw, mode3), lqw, c2w)

        return self._jit_synth(
            key, gt, kernel1, kernel2, sinc_kernel,
            jnp.asarray(a1h), jnp.asarray(a1w), jnp.asarray(a2h),
            jnp.asarray(a2w), jnp.asarray(a3h), jnp.asarray(a3w),
            jnp.int32(h1), jnp.int32(w1), jnp.int32(h2), jnp.int32(w2),
            jnp.asarray(noise1_gaussian), jnp.asarray(second_blur),
            jnp.asarray(noise2_gaussian), jnp.asarray(resize_first),
            gt_hw=(H, W), c1=(c1h, c1w), c2=(c2h, c2w),
            usm_source=usm_source)

    # ------------------------------------------------------------ device
    def _synth(self, key, gt, kernel1, kernel2, sinc_kernel, a1h, a1w, a2h,
               a2w, a3h, a3w, h1, w1, h2, w2, noise1_gaussian, second_blur,
               noise2_gaussian, resize_first, gt_hw, c1, c2,
               usm_source=True):
        opt = self.opt
        H, W = gt_hw
        lqh, lqw = H // self.scale, W // self.scale
        keys = jax.random.split(key, 8)

        gt_usm = self.usm(gt) if usm_source else gt

        # ---------------- first degradation (reference :85-114)
        out = filter2D(gt_usm, kernel1)
        out = jnp.einsum('oh,bhwc->bowc', a1h, out)
        out = jnp.einsum('ow,bhwc->bhoc', a1w, out)
        out = _reflect_extend(out, h1, w1)
        mask1 = _valid_mask(c1, h1, w1)

        def g_noise1(x):
            return random_add_gaussian_noise_jax(
                keys[0], x, sigma_range=opt['noise_range'], clip=True,
                rounds=False, gray_prob=opt['gray_noise_prob'])

        def p_noise1(x):
            return random_add_poisson_noise_jax(
                keys[0], x, scale_range=opt['poisson_scale_range'],
                gray_prob=opt['gray_noise_prob'], clip=True, rounds=False,
                valid_mask=mask1)

        out = jax.lax.cond(noise1_gaussian, g_noise1, p_noise1, out)
        jpeg_q1 = jax.random.uniform(keys[1], (out.shape[0],), jnp.float32,
                                     *opt['jpeg_range'])
        out = jnp.clip(out, 0, 1) * mask1
        out = self.jpeger(out, jpeg_q1)

        # ---------------- second degradation (reference :116-141)
        out = _reflect_extend(out, h1, w1)
        out = jax.lax.cond(second_blur, lambda x: filter2D(x, kernel2),
                           lambda x: x, out)
        out = jnp.einsum('oh,bhwc->bowc', a2h, out)
        out = jnp.einsum('ow,bhwc->bhoc', a2w, out)
        out = _reflect_extend(out, h2, w2)
        mask2 = _valid_mask(c2, h2, w2)

        def g_noise2(x):
            return random_add_gaussian_noise_jax(
                keys[2], x, sigma_range=opt['noise_range2'], clip=True,
                rounds=False, gray_prob=opt['gray_noise_prob2'])

        def p_noise2(x):
            return random_add_poisson_noise_jax(
                keys[2], x, scale_range=opt['poisson_scale_range2'],
                gray_prob=opt['gray_noise_prob2'], clip=True, rounds=False,
                valid_mask=mask2)

        out = jax.lax.cond(noise2_gaussian, g_noise2, p_noise2, out)

        # ---------------- final [resize + sinc] / JPEG order
        # (reference :143-169)
        jpeg_q2 = jax.random.uniform(keys[3], (out.shape[0],), jnp.float32,
                                     *opt['jpeg_range2'])

        def resize3(x):
            x = jnp.einsum('oh,bhwc->bowc', a3h, x)
            return jnp.einsum('ow,bhwc->bhoc', a3w, x)

        def order_resize_first(x):
            x = resize3(x)
            x = filter2D(x, sinc_kernel)
            x = jnp.clip(x, 0, 1)
            return self.jpeger(x, jpeg_q2)

        def order_jpeg_first(x):
            x = jnp.clip(x, 0, 1) * mask2
            x = self.jpeger(x, jpeg_q2)
            x = _reflect_extend(x, h2, w2)
            x = resize3(x)
            return filter2D(x, sinc_kernel)

        out = jax.lax.cond(resize_first, order_resize_first,
                           order_jpeg_first, out)

        lq = jnp.clip(jnp.round(out * 255.0), 0, 255) / 255.
        return gt_usm, lq


def paired_random_crop_device(gts, lqs, gt_patch_size, scale, key):
    """Aligned random crop on device arrays (reference
    transforms.py:26-91 semantics, traced offsets via dynamic_slice).

    gts/lqs: lists of (b,H,W,C) arrays (or single arrays)."""
    single_gt = not isinstance(gts, (list, tuple))
    single_lq = not isinstance(lqs, (list, tuple))
    gts = [gts] if single_gt else list(gts)
    lqs = [lqs] if single_lq else list(lqs)
    lq_patch = gt_patch_size // scale
    b, lh, lw, _ = lqs[0].shape
    kt, kl = jax.random.split(key)
    top = jax.random.randint(kt, (), 0, lh - lq_patch + 1)
    left = jax.random.randint(kl, (), 0, lw - lq_patch + 1)
    lqs = [jax.lax.dynamic_slice(
        x, (0, top, left, 0), (x.shape[0], lq_patch, lq_patch, x.shape[3]))
        for x in lqs]
    gts = [jax.lax.dynamic_slice(
        x, (0, top * scale, left * scale, 0),
        (x.shape[0], gt_patch_size, gt_patch_size, x.shape[3]))
        for x in gts]
    gts = gts[0] if single_gt else gts
    lqs = lqs[0] if single_lq else lqs
    return gts, lqs


class TrainingPairPool:
    """Device-resident training-pair pool (reference
    realesrgan_model.py:32-66 ``_dequeue_and_enqueue``): decorrelates
    per-batch degradation parameters by mixing pairs across steps."""

    def __init__(self, queue_size=180):
        self.queue_size = queue_size
        self.queue_lr = None
        self.queue_gt = None
        self.queue_ptr = 0

    def __call__(self, key, lq, gt):
        b = lq.shape[0]
        if self.queue_lr is None:
            assert self.queue_size % b == 0, (
                f'queue size {self.queue_size} should be divisible by '
                f'batch size {b}')
            self.queue_lr = jnp.zeros((self.queue_size,) + lq.shape[1:],
                                      lq.dtype)
            self.queue_gt = jnp.zeros((self.queue_size,) + gt.shape[1:],
                                      gt.dtype)
            self.queue_ptr = 0
        if self.queue_ptr == self.queue_size:
            idx = jax.random.permutation(key, self.queue_size)
            self.queue_lr = self.queue_lr[idx]
            self.queue_gt = self.queue_gt[idx]
            lq_out = self.queue_lr[0:b]
            gt_out = self.queue_gt[0:b]
            self.queue_lr = self.queue_lr.at[0:b].set(lq)
            self.queue_gt = self.queue_gt.at[0:b].set(gt)
            return lq_out, gt_out
        self.queue_lr = self.queue_lr.at[
            self.queue_ptr:self.queue_ptr + b].set(lq)
        self.queue_gt = self.queue_gt.at[
            self.queue_ptr:self.queue_ptr + b].set(gt)
        self.queue_ptr += b
        return lq, gt
