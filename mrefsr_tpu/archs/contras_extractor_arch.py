"""Contrastively-trained VGG16-conv3_1 feature extractors, flax/NHWC.

Behavioral rebuild of reference basicsr/archs/contras_extractor_arch.py
and contras_multi_extractor_arch.py: two separate VGG16 towers truncated
at conv3_1 (pre-relu), ImageNet input norm. The multi-ref variant runs
the ref tower over a stacked (B, T, H, W, C) ref axis in one batched call
instead of a python list loop — the refs dimension is folded into batch
so all 5 refs go through one conv kernel launch.
"""
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .vgg_arch import IMAGENET_MEAN, IMAGENET_STD, VGGTower


class ContrasExtractorLayer(nn.Module):
    """VGG16 up to conv3_1 inclusive (pre-relu tap), ImageNet-normalized
    (reference contras_extractor_arch.py:10-43). Child named 'model' to
    match the reference state dict."""

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        x = (x - mean) / std
        feats = VGGTower('vgg16', tap_layers=('conv3_1',),
                         last_layer='conv3_1', name='model')(x)
        return feats['conv3_1']


@ARCH_REGISTRY.register()
class ContrasExtractorSep(nn.Module):
    """Single-ref: separate towers for input-up and ref images
    (reference contras_extractor_arch.py:47-62)."""

    @nn.compact
    def __call__(self, image1, image2):
        dense_features1 = ContrasExtractorLayer(
            name='feature_extraction_image1')(image1)
        dense_features2 = ContrasExtractorLayer(
            name='feature_extraction_image2')(image2)
        return {'dense_features1': dense_features1,
                'dense_features2': dense_features2}


@ARCH_REGISTRY.register()
class ContrasMultiExtractorSep(nn.Module):
    """Multi-ref: ref tower applied to a stacked ref axis
    (reference contras_multi_extractor_arch.py:47-64).

    Args:
        image1: (B, H, W, 3) upsampled LR input.
        image_refs: (B, T, H, W, 3) stacked refs.

    Returns:
        {'dense_features1': (B, h, w, 256),
         'dense_features2': (B, T, h, w, 256)}
    """

    @nn.compact
    def __call__(self, image1, image_refs):
        dense_features1 = ContrasExtractorLayer(
            name='feature_extraction_image1')(image1)
        b, t = image_refs.shape[:2]
        flat = image_refs.reshape((b * t,) + image_refs.shape[2:])
        feats = ContrasExtractorLayer(
            name='feature_extraction_image2')(flat)
        dense_features2 = feats.reshape((b, t) + feats.shape[1:])
        return {'dense_features1': dense_features1,
                'dense_features2': dense_features2}
