"""Single-reference restoration training strategy.

Rebuild of reference basicsr/models/ref_restoration_model.py:21-375 —
identical structure to the multi-ref model but with one reference image
(``img_ref``) and un-stacked pre_offset / img_ref_feat. Implemented by
specializing the multi-ref model: a single ref rides as a T=1 stack
internally; three shape hooks adapt the extractor call and the net_g
inputs, so init, training, checkpointing, and validation share one code
path with MultiRefRestorationModel.
"""
import numpy as np

from mrefsr_tpu.utils.registry import MODEL_REGISTRY

from .multi_ref_restoration_model import MultiRefRestorationModel


@MODEL_REGISTRY.register()
class RefRestorationModel(MultiRefRestorationModel):

    _multi_ref = False

    device_input_keys = ('img_in', 'img_in_lq', 'img_in_up', 'img_ref')

    def feed_data(self, data):
        self.img_in_lq = self._as_f32(data['img_in_lq'])
        # single ref rides as a T=1 stack internally
        self.img_ref_list = self._as_f32(data['img_ref'])[:, None]
        self.gt = self._as_f32(data['img_in'])
        self.match_img_in = self._as_f32(data['img_in_up'])
        self._ensure_initialized({
            'img_in_up': self.match_img_in,
            'img_ref_list': self.img_ref_list,
            'img_in_lq': self.img_in_lq,
            'img_in': self.gt,
        })

    # shape hooks — everything else (lazy init incl. pretrain loading,
    # train steps, wave dispatch, save/resume, validation) is inherited
    def _extractor_args(self, match_img_in, refs):
        # ContrasExtractorSep takes ONE ref image (B,H,W,3)
        return match_img_in, refs[:, 0]

    def _apply_extractor(self, vars_ex, match_img_in, refs):
        feats = self.net_extractor.apply(vars_ex, match_img_in,
                                         refs[:, 0])
        # re-stack the ref features as T=1 for the shared map/net_g path
        return feats['dense_features1'], feats['dense_features2'][:, None]

    def _net_g_ref_inputs(self, pre_offset, img_ref_feat):
        # RestorationNet consumes un-stacked (B,...) dicts
        return ({k: v[:, 0] for k, v in pre_offset.items()},
                {k: v[:, 0] for k, v in img_ref_feat.items()})
