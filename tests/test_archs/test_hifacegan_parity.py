"""HiFaceGAN G/D forward parity vs the reference arch (torch CPU;
spectral norm runs in eval mode with stored u/v on both sides)."""
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mrefsr_tpu.archs.hifacegan_arch import (HiFaceGAN,
                                             HiFaceGANDiscriminator,
                                             SPADEGenerator)
from mrefsr_tpu.convert import torch_to_flax

REF = '/root/reference'


@pytest.fixture(scope='module')
def ref_hifacegan():
    registry_spec = importlib.util.spec_from_file_location(
        'basicsr.utils.registry', f'{REF}/basicsr/utils/registry.py')
    registry = importlib.util.module_from_spec(registry_spec)
    registry_spec.loader.exec_module(registry)

    def _load(name, rel):
        spec = importlib.util.spec_from_file_location(name,
                                                      f'{REF}/{rel}')
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    pkg = types.ModuleType('basicsr')
    utils_pkg = types.ModuleType('basicsr.utils')
    utils_pkg.registry = registry
    sys.modules['basicsr'] = pkg
    sys.modules['basicsr.utils'] = utils_pkg
    sys.modules['basicsr.utils.registry'] = registry
    util = _load('basicsr.archs.hifacegan_util',
                 'basicsr/archs/hifacegan_util.py')
    archs_pkg = types.ModuleType('basicsr.archs')
    archs_pkg.hifacegan_util = util
    archs_pkg.__path__ = [f'{REF}/basicsr/archs']
    sys.modules['basicsr.archs'] = archs_pkg
    return _load('basicsr.archs.hifacegan_arch',
                 'basicsr/archs/hifacegan_arch.py')


def _convert(torch_model):
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = torch_to_flax(sd)
    return jax.tree_util.tree_map(jnp.asarray, variables)


def test_hifacegan_generator_parity(ref_hifacegan):
    torch.manual_seed(0)
    ref = ref_hifacegan.HiFaceGAN(num_in_ch=3, num_feat=4, crop_size=64,
                                  is_train=True)
    ref.eval()
    variables = _convert(ref)
    mine = HiFaceGAN(num_in_ch=3, num_feat=4, crop_size=64, is_train=True)

    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
    out_t = out_t.numpy().transpose(0, 2, 3, 1)
    out_j = np.asarray(mine.apply(variables, jnp.asarray(x)))
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=3e-4)


def test_spade_generator_parity(ref_hifacegan):
    torch.manual_seed(1)
    ref = ref_hifacegan.SPADEGenerator(num_in_ch=3, num_feat=4,
                                       crop_size=64, is_train=False)
    ref.eval()
    variables = _convert(ref)
    mine = SPADEGenerator(num_in_ch=3, num_feat=4, crop_size=64,
                          is_train=False)
    x = np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
    out_t = out_t.numpy().transpose(0, 2, 3, 1)
    out_j = np.asarray(mine.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out_j, out_t, atol=3e-4)


def test_hifacegan_discriminator_parity(ref_hifacegan):
    torch.manual_seed(2)
    ref = ref_hifacegan.HiFaceGANDiscriminator(
        num_in_ch=3, num_out_ch=3, num_d=2, n_layers_d=3, num_feat=8)
    ref.eval()
    variables = _convert(ref)
    mine = HiFaceGANDiscriminator(num_in_ch=3, num_out_ch=3, num_d=2,
                                  n_layers_d=3, num_feat=8)
    x = np.random.RandomState(3).rand(1, 64, 64, 6).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
    out_j = mine.apply(variables, jnp.asarray(x))
    assert len(out_j) == len(out_t) == 2
    for feats_j, feats_t in zip(out_j, out_t):
        assert len(feats_j) == len(feats_t)
        for fj, ft in zip(feats_j, feats_t):
            ft = ft.numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(np.asarray(fj), ft, atol=3e-4)
