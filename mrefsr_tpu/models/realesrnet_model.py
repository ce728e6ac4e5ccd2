"""RealESRNet: blind-SR training with on-device degradation synthesis,
MSE-only (reference basicsr/models/realesrnet_model.py:15-189).

The two-stage degradation (blur -> random resize -> noise -> JPEG, twice,
plus final sinc) runs entirely on-chip through
``DegradationSynthesizer`` — one compiled graph for every random scale
(see degradation_synth.py) — followed by the standard SRModel jitted
L1/MSE step.
"""
import jax
import numpy as np

from mrefsr_tpu.utils.registry import MODEL_REGISTRY

from .degradation_synth import (DegradationSynthesizer, TrainingPairPool,
                                paired_random_crop_device)
from .sr_model import SRModel


@MODEL_REGISTRY.register(suffix='basicsr')
class RealESRNetModel(SRModel):
    """RealESRNet Model: synthesize LQ on device, optimize without GAN."""

    def __init__(self, opt):
        super().__init__(opt)
        self.synth = DegradationSynthesizer(opt)
        self.pool = TrainingPairPool(opt.get('queue_size', 180))

    def feed_data(self, data):
        if self.is_train and self.opt.get('high_order_degradation', True):
            gt = jax.numpy.asarray(np.asarray(data['gt'], np.float32))
            # USM the GT itself when configured (reference
            # realesrnet_model.py:74-76)
            if self.opt['gt_usm'] is True:
                gt = self.synth.usm(gt)
            kernel1 = jax.numpy.asarray(
                np.asarray(data['kernel1'], np.float32))
            kernel2 = jax.numpy.asarray(
                np.asarray(data['kernel2'], np.float32))
            sinc_kernel = jax.numpy.asarray(
                np.asarray(data['sinc_kernel'], np.float32))

            # degrade from gt itself (already sharpened above iff
            # gt_usm: true) — reference realesrnet_model.py:86 uses
            # self.gt, unlike RealESRGAN which degrades from usm(gt)
            _, lq = self.synth(self.next_rng(), gt, kernel1, kernel2,
                               sinc_kernel, usm_source=False)
            gt, lq = paired_random_crop_device(
                gt, lq, self.opt['gt_size'], self.opt['scale'],
                self.next_rng())
            lq, gt = self.pool(self.next_rng(), lq, gt)
            # keep on device — optimize_parameters device_puts with the
            # batch sharding, a no-op copy for an already-resident array
            self.lq = lq
            self.gt = gt
            self._ensure_initialized(self.lq)
        else:
            super().feed_data(data)

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img):
        # no synthetic degradation during validation (reference :185-189)
        self.is_train = False
        super().nondist_validation(dataloader, current_iter, tb_logger,
                                   save_img)
        self.is_train = True
