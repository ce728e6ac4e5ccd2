"""SwinIR models: reflect-pad test wrapper
(reference basicsr/models/swinir_model.py:10-39)."""
import jax.numpy as jnp
import numpy as np

from mrefsr_tpu.utils.registry import MODEL_REGISTRY

from .esrgan_model import ESRGANModel
from .sr_model import SRModel


class _SwinIRTestMixin:

    def feed_data(self, data):
        # initialize with a window-size-padded example: the swin window
        # partition needs H,W % window_size == 0
        lq = np.asarray(data['lq'], np.float32)
        ws = self.opt['network_g']['window_size']
        pad_h = (ws - lq.shape[1] % ws) % ws
        pad_w = (ws - lq.shape[2] % ws) % ws
        example = np.pad(lq, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                         mode='reflect') if (pad_h or pad_w) else lq
        self._ensure_initialized(example)
        self.lq = lq
        self.gt = np.asarray(data['gt'], np.float32) \
            if 'gt' in data else None

    def test(self):
        window_size = self.opt['network_g']['window_size']
        scale = self.opt.get('scale', 1)
        _, h, w, _ = self.lq.shape
        mod_pad_h = (window_size - h % window_size) % window_size
        mod_pad_w = (window_size - w % window_size) % window_size
        img = jnp.asarray(self.lq)
        if mod_pad_h or mod_pad_w:
            img = jnp.pad(img, ((0, 0), (0, mod_pad_h), (0, mod_pad_w),
                                (0, 0)), mode='reflect')
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        variables = self.ema_variables if (
            getattr(self, 'ema_decay', 0) > 0
            and self.ema_variables is not None) else self.variables
        mp = (self.opt.get('val') or {}).get('mixed_precision')
        variables = self._prepare_eval_variables(
            variables, jnp.bfloat16 if mp == 'bfloat16' else None)
        out = self._eval_step(variables, img)
        oh, ow = out.shape[1], out.shape[2]
        self.output = out[:, :oh - mod_pad_h * scale,
                          :ow - mod_pad_w * scale, :]


@MODEL_REGISTRY.register()
class SwinIRModel(_SwinIRTestMixin, SRModel):
    pass


@MODEL_REGISTRY.register()
class SwinIRGANModel(_SwinIRTestMixin, ESRGANModel):
    pass
