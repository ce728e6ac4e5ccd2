"""StyleGAN2 G/D parity vs the reference arch (loaded standalone with
pure-torch implementations of its fused_act/upfirdn2d CUDA ops)."""
import importlib.util
import math
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

import jax
import jax.numpy as jnp

from mrefsr_tpu.archs.stylegan2_arch import (StyleGAN2Discriminator,
                                             StyleGAN2Generator,
                                             stylegan2_rename)
from mrefsr_tpu.convert import torch_to_flax

REF = '/root/reference'


def torch_upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """Pure-torch up-FIR-down with the CUDA op's semantics."""
    b, c, h, w = x.shape
    kh, kw = kernel.shape
    x = x.reshape(-1, 1, h, w)
    # zero-stuff upsample
    if up > 1:
        out = x.new_zeros(x.shape[0], 1, h * up, w * up)
        out[:, :, ::up, ::up] = x
        x = out
    pad0, pad1 = pad
    x = F.pad(x, [max(pad0, 0), max(pad1, 0), max(pad0, 0), max(pad1, 0)])
    if pad0 < 0 or pad1 < 0:
        x = x[:, :,
              max(-pad0, 0):x.shape[2] - max(-pad1, 0),
              max(-pad0, 0):x.shape[3] - max(-pad1, 0)]
    w_k = torch.flip(kernel, [0, 1]).view(1, 1, kh, kw).to(x)
    x = F.conv2d(x, w_k)
    if down > 1:
        x = x[:, :, ::down, ::down]
    return x.reshape(b, c, x.shape[2], x.shape[3])


def torch_fused_leaky_relu(x, bias=None, negative_slope=0.2,
                           scale=2**0.5):
    if bias is not None:
        rest = [1] * (x.dim() - 2)
        x = x + bias.view(1, -1, *rest)
    return F.leaky_relu(x, negative_slope) * scale


class TorchFusedLeakyReLU(tnn.Module):

    def __init__(self, num_channels, negative_slope=0.2, scale=2**0.5):
        super().__init__()
        self.bias = tnn.Parameter(torch.zeros(num_channels))
        self.negative_slope = negative_slope
        self.scale = scale

    def forward(self, x):
        return torch_fused_leaky_relu(x, self.bias, self.negative_slope,
                                      self.scale)


@pytest.fixture(scope='module')
def ref_sg2():
    registry_spec = importlib.util.spec_from_file_location(
        'basicsr.utils.registry', f'{REF}/basicsr/utils/registry.py')
    registry = importlib.util.module_from_spec(registry_spec)
    registry_spec.loader.exec_module(registry)

    pkg = types.ModuleType('basicsr')
    utils_pkg = types.ModuleType('basicsr.utils')
    utils_pkg.registry = registry
    ops_pkg = types.ModuleType('basicsr.ops')
    fused = types.ModuleType('basicsr.ops.fused_act')
    fused.FusedLeakyReLU = TorchFusedLeakyReLU
    fused.fused_leaky_relu = torch_fused_leaky_relu
    upf = types.ModuleType('basicsr.ops.upfirdn2d')
    upf.upfirdn2d = torch_upfirdn2d
    for name, mod in (('basicsr', pkg), ('basicsr.utils', utils_pkg),
                      ('basicsr.utils.registry', registry),
                      ('basicsr.ops', ops_pkg),
                      ('basicsr.ops.fused_act', fused),
                      ('basicsr.ops.upfirdn2d', upf)):
        sys.modules[name] = mod

    spec = importlib.util.spec_from_file_location(
        '_ref_stylegan2', f'{REF}/basicsr/archs/stylegan2_arch.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


RNG = np.random.RandomState(11)


def _import_variables(torch_model, flax_variables_shape=None):
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = torch_to_flax(sd, rename=stylegan2_rename)
    return jax.tree_util.tree_map(jnp.asarray, variables)


def _fix_constant_input(variables):
    """torch constant_input.weight is (1,c,4,4) -> NHWC (1,4,4,c)."""
    p = variables['params']['constant_input']
    p['const'] = jnp.transpose(p['const'], (0, 2, 3, 1))
    return variables


def _fix_noises(variables):
    for k in list(variables['params']):
        if k.startswith('noises.noise'):
            variables['params'][k] = jnp.transpose(
                variables['params'][k], (0, 2, 3, 1))
    return variables


@pytest.mark.parametrize('out_size', [32, 64])
def test_generator_parity(ref_sg2, out_size):
    torch.manual_seed(0)
    ref = ref_sg2.StyleGAN2Generator(out_size, num_style_feat=32,
                                     num_mlp=2, channel_multiplier=1,
                                     narrow=0.25)
    ref.eval()

    variables = _import_variables(ref)
    variables = _fix_noises(_fix_constant_input(variables))
    mine = StyleGAN2Generator(out_size, num_style_feat=32, num_mlp=2,
                              channel_multiplier=1, narrow=0.25)

    styles = RNG.randn(2, 32).astype(np.float32)
    with torch.no_grad():
        out_t, _ = ref([torch.from_numpy(styles)], randomize_noise=False)
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    out_j, _ = mine.apply(variables, [jnp.asarray(styles)],
                          randomize_noise=False)
    out_j = np.asarray(out_j)
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=2e-4)


def test_generator_style_mixing_parity(ref_sg2):
    torch.manual_seed(1)
    ref = ref_sg2.StyleGAN2Generator(32, num_style_feat=32, num_mlp=2,
                                     channel_multiplier=1, narrow=0.25)
    ref.eval()
    variables = _fix_noises(_fix_constant_input(_import_variables(ref)))
    mine = StyleGAN2Generator(32, num_style_feat=32, num_mlp=2,
                              channel_multiplier=1, narrow=0.25)

    s1 = RNG.randn(1, 32).astype(np.float32)
    s2 = RNG.randn(1, 32).astype(np.float32)
    with torch.no_grad():
        out_t, _ = ref([torch.from_numpy(s1), torch.from_numpy(s2)],
                       randomize_noise=False, inject_index=3)
    out_t = out_t.numpy().transpose(0, 2, 3, 1)
    out_j, _ = mine.apply(variables,
                          [jnp.asarray(s1), jnp.asarray(s2)],
                          randomize_noise=False, inject_index=3)
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-4)


def test_discriminator_parity(ref_sg2):
    torch.manual_seed(2)
    ref = ref_sg2.StyleGAN2Discriminator(32, channel_multiplier=1,
                                         narrow=0.25, stddev_group=2)
    ref.eval()
    variables = _import_variables(ref)
    mine = StyleGAN2Discriminator(32, channel_multiplier=1, narrow=0.25,
                                  stddev_group=2)

    x = RNG.randn(4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(
            x.transpose(0, 3, 1, 2)).contiguous()).numpy()
    out_j = np.asarray(mine.apply(variables, jnp.asarray(x)))
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=3e-4)
