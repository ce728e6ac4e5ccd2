"""Checkpoint conversion regressions: param_key selection on dual-key
files, spectral-norm round-trip, BN mapping under rename."""
import numpy as np
import pytest
import torch

from mrefsr_tpu.convert import (flax_to_torch, load_torch_state_dict,
                                torch_to_flax)


def _save(tmp_path, obj, name='ckpt.pth'):
    p = tmp_path / name
    torch.save(obj, str(p))
    return str(p)


def test_load_params_ema_from_dual_key_file(tmp_path):
    """Regression: param_key=None auto-unwrapped 'params' first, so every
    params_ema request on a dual-key file silently got the NON-EMA
    weights."""
    params = {'conv.weight': torch.zeros(4, 3, 3, 3)}
    ema = {'conv.weight': torch.ones(4, 3, 3, 3)}
    path = _save(tmp_path, {'params': params, 'params_ema': ema})
    sd = load_torch_state_dict(path, param_key='params_ema')
    assert float(sd['conv.weight'].mean()) == 1.0
    sd = load_torch_state_dict(path, param_key='params')
    assert float(sd['conv.weight'].mean()) == 0.0


def test_load_params_ema_fallback_and_bare(tmp_path):
    # params-only file: params_ema falls back to params (reference
    # base_model.py:294-297)
    path = _save(tmp_path, {'params': {'w': torch.full((2,), 3.0)}})
    sd = load_torch_state_dict(path, param_key='params_ema')
    assert float(sd['w'][0]) == 3.0
    # bare state dict: any param_key uses it as-is
    path = _save(tmp_path, {'module.w': torch.full((2,), 5.0)}, 'bare.pth')
    sd = load_torch_state_dict(path, param_key='params')
    assert float(sd['w'][0]) == 5.0
    # wrapped file + param_key=None is a loud error, not garbage arrays
    path = _save(tmp_path, {'params': {'w': torch.zeros(2)}}, 'wrap.pth')
    with pytest.raises(ValueError):
        load_torch_state_dict(path, param_key=None)


def test_spectral_norm_round_trip():
    """Regression: flax_to_torch dropped the 'spectral' collection and
    saved SN kernels as '.weight' instead of '.weight_orig', so saved SN
    discriminators could not strict-load in the reference nor resume
    their power-iteration state here."""
    sd = {
        'd.weight_orig': torch.ones(8, 4, 3, 3),
        'd.weight_u': torch.full((8,), 2.0),
        'd.weight_v': torch.full((36,), 3.0),
        'd.bias': torch.zeros(8),
    }
    tree = torch_to_flax({k: v.numpy() for k, v in sd.items()})
    assert 'spectral' in tree
    back = flax_to_torch(tree['params'], tree.get('batch_stats'),
                         spectral=tree['spectral'])
    assert set(back) == set(sd)
    np.testing.assert_array_equal(back['d.weight_orig'],
                                  sd['d.weight_orig'].numpy())
    np.testing.assert_array_equal(back['d.weight_u'], 2.0 * np.ones(8))
    np.testing.assert_array_equal(back['d.weight_v'], 3.0 * np.ones(36))


def test_batchnorm_gamma_maps_to_scale_under_rename():
    """Regression: norm-module detection ran on PRE-rename keys but
    membership was tested on the renamed key, so a rename that moves a
    BatchNorm layer mapped its gamma to 'weight' instead of 'scale'."""
    sd = {
        'old.bn.weight': np.ones(4, np.float32),
        'old.bn.bias': np.zeros(4, np.float32),
        'old.bn.running_mean': np.zeros(4, np.float32),
        'old.bn.running_var': np.ones(4, np.float32),
    }
    tree = torch_to_flax(sd, rename=lambda k: k.replace('old.', 'new_'))
    assert 'scale' in tree['params']['new_bn']
    assert 'weight' not in tree['params']['new_bn']
    assert 'mean' in tree['batch_stats']['new_bn']


def test_get_data_mesh_default_is_all_devices():
    """Regression: a truncated mesh cached by a num_gpu<N model was
    returned for later default (all-device) requests."""
    import jax

    from mrefsr_tpu.parallel import mesh as mesh_mod
    prev = mesh_mod._mesh
    try:
        mesh_mod._mesh = None
        m1 = mesh_mod.get_data_mesh(1)
        assert m1.devices.size == 1
        m_all = mesh_mod.get_data_mesh()
        assert m_all.devices.size == len(jax.devices())
    finally:
        mesh_mod._mesh = prev
