"""RealESRGAN: blind-SR GAN training with on-device degradation
synthesis (reference basicsr/models/realesrgan_model.py:17-283).

Synthesis runs through ``DegradationSynthesizer`` (one compiled graph
for every random scale — see degradation_synth.py); training reuses the
SRGAN jitted alternating step with per-loss GT routing (USM'd vs plain
targets, reference :196-204) and optional LDL loss.
"""
import jax
import numpy as np

from mrefsr_tpu.utils.registry import MODEL_REGISTRY

from .degradation_synth import (DegradationSynthesizer, TrainingPairPool,
                                paired_random_crop_device)
from .srgan_model import SRGANModel


@MODEL_REGISTRY.register(suffix='basicsr')
class RealESRGANModel(SRGANModel):
    """RealESRGAN Model: synthesize LQ in device tensors, GAN training."""

    def __init__(self, opt):
        super().__init__(opt)
        self.synth = DegradationSynthesizer(opt)
        self.pool = TrainingPairPool(opt.get('queue_size', 180))
        self.gt_usm = None

    def feed_data(self, data):
        if self.is_train and self.opt.get('high_order_degradation', True):
            gt = jax.numpy.asarray(np.asarray(data['gt'], np.float32))
            kernel1 = jax.numpy.asarray(
                np.asarray(data['kernel1'], np.float32))
            kernel2 = jax.numpy.asarray(
                np.asarray(data['kernel2'], np.float32))
            sinc_kernel = jax.numpy.asarray(
                np.asarray(data['sinc_kernel'], np.float32))

            gt_usm, lq = self.synth(self.next_rng(), gt, kernel1, kernel2,
                                    sinc_kernel)
            (gt, gt_usm), lq = paired_random_crop_device(
                [gt, gt_usm], lq, self.opt['gt_size'], self.opt['scale'],
                self.next_rng())
            # training pair pool, then re-sharpen the swapped gt
            # (reference :177-181)
            lq, gt = self.pool(self.next_rng(), lq, gt)
            gt_usm = self.synth.usm(gt)
            self.lq = lq
            self.gt = gt
            self.gt_usm = gt_usm
            self._ensure_initialized(self.lq)
        else:
            super().feed_data(data)
            self.gt_usm = None
            if self.gt is not None:
                self.gt_usm = np.asarray(
                    self.synth.usm(jax.numpy.asarray(self.gt)))

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img):
        # no synthetic degradation during validation (reference :188-192)
        self.is_train = False
        super().nondist_validation(dataloader, current_iter, tb_logger,
                                   save_img)
        self.is_train = True

    def _train_step_inputs(self):
        """Per-loss GT routing (reference realesrgan_model.py:196-204):
        pixel / perceptual / GAN losses can each use the USM-sharpened
        GT; LDL always uses the raw gt. Shared by per-step dispatch and
        the fused GAN wave (both in SRGANModel)."""
        gt_usm = self.gt_usm if self.gt_usm is not None else self.gt
        gt_pix = gt_usm if self.opt.get('l1_gt_usm', True) else self.gt
        gt_percep = gt_usm if self.opt.get('percep_gt_usm', True) \
            else self.gt
        gt_gan = gt_usm if self.opt.get('gan_gt_usm', True) else self.gt
        return self.lq, gt_pix, gt_percep, gt_gan, self.gt
