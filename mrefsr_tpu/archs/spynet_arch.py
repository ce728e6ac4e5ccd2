"""SpyNet optical flow, flax/NHWC
(reference basicsr/archs/spynet_arch.py:10-100)."""
import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mrefsr_tpu.ops import flow_warp, interpolate
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


class BasicModule(nn.Module):
    """5-conv flow refiner (reference spynet_arch.py:10-25). Conv children
    named basic_module.{0,2,4,6,8} per the torch Sequential."""

    @nn.compact
    def __call__(self, x):
        chans = [32, 64, 32, 16, 2]
        for i, ch in enumerate(chans):
            x = nn.Conv(ch, (7, 7), padding=3,
                        name=f'basic_module.{i * 2}')(x)
            if i < 4:
                x = nn.relu(x)
        return x


def _avg_pool2(x):
    """2x2 stride-2 average pool (count_include_pad irrelevant on even
    dims)."""
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


@ARCH_REGISTRY.register()
class SpyNet(nn.Module):
    """6-level coarse-to-fine flow (reference spynet_arch.py:28-100).

    Call: (ref, supp) NHWC in [0,1]; returns flow (N,H,W,2) (dx, dy).
    """
    load_path: Any = None  # handled by the model layer; kept for config

    @nn.compact
    def __call__(self, ref, supp):
        assert ref.shape == supp.shape
        h, w = ref.shape[1], ref.shape[2]
        w_floor = math.floor(math.ceil(w / 32.0) * 32.0)
        h_floor = math.floor(math.ceil(h / 32.0) * 32.0)

        ref_r = interpolate(ref, size=(h_floor, w_floor), mode='bilinear',
                            align_corners=False)
        supp_r = interpolate(supp, size=(h_floor, w_floor),
                             mode='bilinear', align_corners=False)

        mean = jnp.asarray(_MEAN, ref.dtype)
        std = jnp.asarray(_STD, ref.dtype)
        refs = [(ref_r - mean) / std]
        supps = [(supp_r - mean) / std]
        for _ in range(5):
            refs.insert(0, _avg_pool2(refs[0]))
            supps.insert(0, _avg_pool2(supps[0]))

        n = ref.shape[0]
        flow = jnp.zeros((n, refs[0].shape[1] // 2,
                          refs[0].shape[2] // 2, 2), ref.dtype)
        for level in range(len(refs)):
            up_flow = interpolate(flow, scale_factor=2, mode='bilinear',
                                  align_corners=True) * 2.0
            warped = flow_warp(supps[level], up_flow,
                               interp_mode='bilinear',
                               padding_mode='border')
            flow = BasicModule(name=f'basic_module.{level}')(
                jnp.concatenate([refs[level], warped, up_flow],
                                axis=-1)) + up_flow

        flow = interpolate(flow, size=(h, w), mode='bilinear',
                           align_corners=False)
        scale = jnp.asarray([w / w_floor, h / h_floor], flow.dtype)
        return flow * scale
