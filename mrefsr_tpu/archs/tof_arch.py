"""TOFlow: task-oriented flow video SR, flax/NHWC.

Rebuild of reference basicsr/archs/tof_arch.py (BasicModule:9,
SPyNetTOF:43, TOFlow:97). Unlike spynet_arch, the flow modules here
carry BatchNorm; normalization constants live in TOFlow itself.
"""
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from mrefsr_tpu.ops import flow_warp, interpolate
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


def _avg_pool2(x):
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


class BasicModule(nn.Module):
    """Flow refiner with BN (reference tof_arch.py:9-40). Sequential
    children: convs at {0,3,6,9,12} (first four bias-free), BN at
    {1,4,7,10}."""

    @nn.compact
    def __call__(self, x, train=False):
        chans = [32, 64, 32, 16]
        for i, ch in enumerate(chans):
            x = nn.Conv(ch, (7, 7), padding=3, use_bias=False,
                        name=f'basic_module.{i * 3}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5,
                             name=f'basic_module.{i * 3 + 1}')(x)
            x = nn.relu(x)
        return nn.Conv(2, (7, 7), padding=3, name='basic_module.12')(x)


class SPyNetTOF(nn.Module):
    """4-level coarse-to-fine flow for TOFlow
    (reference tof_arch.py:43-94). Call: (ref, supp) NHWC; returns flow
    (N,H,W,2)."""

    @nn.compact
    def __call__(self, ref, supp, train=False):
        n, h, w, _ = ref.shape
        refs, supps = [ref], [supp]
        for _ in range(3):
            refs.insert(0, _avg_pool2(refs[0]))
            supps.insert(0, _avg_pool2(supps[0]))

        flow = jnp.zeros((n, h // 16, w // 16, 2), ref.dtype)
        for i in range(4):
            flow_up = interpolate(flow, scale_factor=2, mode='bilinear',
                                  align_corners=True) * 2.0
            warped = flow_warp(supps[i], flow_up)
            flow = flow_up + BasicModule(name=f'basic_module.{i}')(
                jnp.concatenate([refs[i], warped, flow_up], axis=-1),
                train=train)
        return flow


@ARCH_REGISTRY.register()
class TOFlow(nn.Module):
    """TOFlow video SR (reference tof_arch.py:97-180).

    Call: lrs (N, 7, H, W, 3) pre-upsampled frames; returns the SR
    center frame (N, H, W, 3).
    """
    adapt_official_weights: bool = False

    @nn.compact
    def __call__(self, lrs, train=False):
        ref_idx = 0 if self.adapt_official_weights else 3
        if self.adapt_official_weights:
            lrs = lrs[:, jnp.asarray([3, 0, 1, 2, 4, 5, 6])]

        mean = jnp.asarray(_MEAN, lrs.dtype)
        std = jnp.asarray(_STD, lrs.dtype)
        lrs = (lrs - mean) / std

        spynet = SPyNetTOF(name='spynet')
        lr_ref = lrs[:, ref_idx]
        aligned = []
        for i in range(7):
            if i == ref_idx:
                aligned.append(lr_ref)
            else:
                lr_supp = lrs[:, i]
                flow = spynet(lr_ref, lr_supp, train=train)
                aligned.append(flow_warp(lr_supp, flow))

        # (n, h, w, 7, 3) -> (n, h, w, 21): frame-major channel order
        # matching the torch view(b, 7*3, h, w) (reference tof_arch.py:170)
        hr = jnp.stack(aligned, axis=3)
        n, h, w = hr.shape[:3]
        hr = hr.reshape(n, h, w, 21)
        hr = nn.relu(nn.Conv(64, (9, 9), padding=4, name='conv_1')(hr))
        hr = nn.relu(nn.Conv(64, (9, 9), padding=4, name='conv_2')(hr))
        hr = nn.relu(nn.Conv(64, (1, 1), name='conv_3')(hr))
        hr = nn.Conv(3, (1, 1), name='conv_4')(hr) + lr_ref
        return hr * std + mean
