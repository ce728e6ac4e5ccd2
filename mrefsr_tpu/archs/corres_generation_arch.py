"""Correspondence generation: dense patch matching -> DCN pre-offsets.

Behavioral rebuild of reference basicsr/archs/corres_generation_arch.py:
15-118. Per sample: L2-normalize the per-position feature vectors, run
top-1 patch matching (mrefsr_tpu.ops.feature_match_index — the MXU
matmul + online argmax kernel), convert the argmax map to a flow field,
expand into 9 shifted per-tap copies, and upsample x2/x4 for the
relu2_1/relu1_1 levels. Also runs VGG19 on the HR ref for the aggregation
features.

Layout notes vs the reference: everything is NHWC and the batch loop is a
vmap; pre-offsets are returned as (B, H, W, 9, 2) with last dim (x, y)
(the reference uses (B, 9, H, W, 2)).
"""
from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrefsr_tpu.ops import feature_match_index, index_to_flow, tensor_shift
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .vgg_arch import VGGFeatureExtractor


def _shifted_offsets(flow, step):
    """Stack the 9 tap-shifted copies of a flow field
    (reference corres_generation_arch.py:73-78): tap (i, j) gets the flow
    shifted down/right by (i*step, j*step). Returns (h, w, 9, 2)."""
    shifts = []
    for i in range(3):
        for j in range(3):
            shifts.append(tensor_shift(flow, (i * step, j * step)))
    return jnp.stack(shifts, axis=2)


def _upsample_flow(flow, factor):
    """repeat_interleave x factor on both axes, values scaled by factor
    (reference corres_generation_arch.py:82-97)."""
    up = jnp.repeat(jnp.repeat(flow, factor, axis=0), factor, axis=1)
    return up * factor


def compute_pre_offsets(feat_in, feat_ref, patch_size=3, stride=1):
    """Single-sample correspondence: (H,W,C) features ->
    {relu1_1/relu2_1/relu3_1: (H*, W*, 9, 2)} pre-offset maps."""
    c = feat_in.shape[-1]
    # per-position channel-vector L2 normalization
    # (reference corres_generation_arch.py:57-59)
    feat_in = feat_in / (jnp.linalg.norm(feat_in, axis=-1,
                                         keepdims=True) + 1e-12)
    feat_ref = feat_ref / (jnp.linalg.norm(feat_ref, axis=-1,
                                           keepdims=True) + 1e-12)
    max_idx, _ = feature_match_index(feat_in, feat_ref,
                                     patch_size=patch_size,
                                     input_stride=stride, ref_stride=stride,
                                     is_norm=True, norm_input=True)
    offset_relu3 = index_to_flow(max_idx)  # (h, w, 2), (x, y)
    offset_relu2 = _upsample_flow(offset_relu3, 2)
    offset_relu1 = _upsample_flow(offset_relu3, 4)
    return {
        'relu3_1': _shifted_offsets(offset_relu3, 1),
        'relu2_1': _shifted_offsets(offset_relu2, 2),
        'relu1_1': _shifted_offsets(offset_relu1, 4),
    }


@ARCH_REGISTRY.register()
class CorrespondenceGenerationArch(nn.Module):
    """Patch matching + VGG19 HR-ref features
    (reference corres_generation_arch.py:15-118). No trainable matching
    params; the VGG weights are frozen imports.
    """
    patch_size: int = 3
    stride: int = 1
    vgg_layer_list: Sequence[str] = ('relu1_1', 'relu2_1', 'relu3_1')
    vgg_type: str = 'vgg19'

    @nn.compact
    def __call__(self, dense_features, img_ref_hr):
        """
        Args:
            dense_features: {'dense_features1': (B,h,w,C) input-up feats,
                'dense_features2': (B,h,w,C) ref feats} from the
                contrastive extractor.
            img_ref_hr: (B, H, W, 3) HR reference image in [0,1].

        Returns:
            pre_offset: {level: (B, H_l, W_l, 9, 2)} DCN seed offsets.
            img_ref_feat: {level: (B, H_l, W_l, C_l)} VGG19 features.
        """
        pre_offset = jax.vmap(
            partial(compute_pre_offsets, patch_size=self.patch_size,
                    stride=self.stride))(dense_features['dense_features1'],
                                         dense_features['dense_features2'])
        img_ref_feat = VGGFeatureExtractor(
            layer_name_list=tuple(self.vgg_layer_list),
            vgg_type=self.vgg_type, name='vgg')(img_ref_hr)
        return pre_offset, img_ref_feat
