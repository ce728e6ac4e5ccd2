"""End-to-end arch parity: torch reference nets vs flax rebuilds with
converted weights — the gold test for checkpoint import fidelity."""
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo/tests')

from mrefsr_tpu.convert import torch_to_flax

REF = '/root/reference'


def _stub_basicsr():
    """Set up sys.modules so reference arch files import standalone."""
    if 'basicsr' in sys.modules and not hasattr(sys.modules['basicsr'],
                                                '_is_stub'):
        pass
    pkg = types.ModuleType('basicsr')
    pkg._is_stub = True
    pkg.__path__ = [f'{REF}/basicsr']

    _loaded = {}

    def _load(modname, rel):
        if rel in _loaded:
            return _loaded[rel]
        spec = importlib.util.spec_from_file_location(modname,
                                                      f'{REF}/{rel}')
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        spec.loader.exec_module(mod)
        _loaded[rel] = mod
        return mod

    registry = _load('basicsr.utils.registry',
                     'basicsr/utils/registry.py')
    utils_pkg = types.ModuleType('basicsr.utils')
    utils_pkg.registry = registry
    utils_pkg.get_root_logger = lambda *a, **k: types.SimpleNamespace(
        info=lambda *a, **k: None, warning=lambda *a, **k: None)
    sys.modules['basicsr'] = pkg
    sys.modules['basicsr.utils'] = utils_pkg
    sys.modules['basicsr.utils.registry'] = registry

    # stub CUDA ops + torchvision for arch_util import
    # working pure-torch DCN so DCN-using reference archs run on CPU
    from torch_dcn_stub import (ModulatedDeformConvPackStub,
                                torch_modulated_deform_conv2d)
    dcn_stub = types.ModuleType('basicsr.ops.dcn')
    dcn_stub.ModulatedDeformConvPack = ModulatedDeformConvPackStub
    dcn_stub.modulated_deform_conv = torch_modulated_deform_conv2d
    ops_pkg = types.ModuleType('basicsr.ops')
    sys.modules['basicsr.ops'] = ops_pkg
    sys.modules['basicsr.ops.dcn'] = dcn_stub
    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        tv.__version__ = '0.0.0'
        tv.ops = types.SimpleNamespace(deform_conv2d=None)
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.ops'] = tv.ops

    arch_util = _load('basicsr.archs.arch_util',
                      'basicsr/archs/arch_util.py')
    archs_pkg = types.ModuleType('basicsr.archs')
    archs_pkg.arch_util = arch_util
    archs_pkg.__path__ = [f'{REF}/basicsr/archs']
    sys.modules['basicsr.archs'] = archs_pkg
    return _load


@pytest.fixture(scope='module')
def ref_loader():
    return _stub_basicsr()


def _compare(torch_model, flax_model, inputs_nhwc, atol=1e-4, rename=None):
    torch_model.eval()
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = torch_to_flax(sd, rename=rename)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    with torch.no_grad():
        out_t = torch_model(
            torch.from_numpy(inputs_nhwc.transpose(0, 3, 1, 2)))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    out_j = flax_model.apply(variables, jnp.asarray(inputs_nhwc))
    out_j = np.asarray(out_j)
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=atol)


def test_rrdbnet_parity(ref_loader):
    ref_rrdb = ref_loader('basicsr.archs.rrdbnet_arch',
                          'basicsr/archs/rrdbnet_arch.py')
    from mrefsr_tpu.archs.rrdbnet_arch import RRDBNet
    tm = ref_rrdb.RRDBNet(3, 3, scale=4, num_feat=16, num_block=2,
                          num_grow_ch=8)
    fm = RRDBNet(3, 3, scale=4, num_feat=16, num_block=2, num_grow_ch=8)
    x = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    _compare(tm, fm, x)


def test_rrdbnet_scale2_pixel_unshuffle(ref_loader):
    ref_rrdb = ref_loader('basicsr.archs.rrdbnet_arch',
                          'basicsr/archs/rrdbnet_arch.py')
    from mrefsr_tpu.archs.rrdbnet_arch import RRDBNet
    tm = ref_rrdb.RRDBNet(3, 3, scale=2, num_feat=16, num_block=1,
                          num_grow_ch=8)
    fm = RRDBNet(3, 3, scale=2, num_feat=16, num_block=1, num_grow_ch=8)
    x = np.random.RandomState(1).rand(1, 16, 16, 3).astype(np.float32)
    _compare(tm, fm, x)


def test_msrresnet_parity(ref_loader):
    ref_sr = ref_loader('basicsr.archs.srresnet_arch',
                        'basicsr/archs/srresnet_arch.py')
    from mrefsr_tpu.archs.srresnet_arch import MSRResNet
    tm = ref_sr.MSRResNet(num_feat=16, num_block=2, upscale=4)
    fm = MSRResNet(num_feat=16, num_block=2, upscale=4)
    x = np.random.RandomState(2).rand(2, 12, 12, 3).astype(np.float32)
    _compare(tm, fm, x)


def test_edsr_parity(ref_loader):
    ref_edsr = ref_loader('basicsr.archs.edsr_arch',
                          'basicsr/archs/edsr_arch.py')
    from mrefsr_tpu.archs.edsr_arch import EDSR
    tm = ref_edsr.EDSR(3, 3, num_feat=16, num_block=2, upscale=2)
    fm = EDSR(3, 3, num_feat=16, num_block=2, upscale=2)
    x = np.random.RandomState(3).rand(1, 14, 14, 3).astype(np.float32)
    _compare(tm, fm, x, atol=2e-3)  # img_range=255 amplifies fp error


def test_refaware_block_parity(ref_loader):
    """RefAwareBlock (reference arch_util.py:142-197): conditional-conv
    MoE + SE gating, incl. the original_size partial-mean path."""
    arch_util = sys.modules['basicsr.archs.arch_util']
    torch.manual_seed(7)
    tm = arch_util.RefAwareBlock(out_channels=3, nf=8, ref_nf=16,
                                 num_experts=4)
    tm.eval()
    from mrefsr_tpu.archs.arch_util import RefAwareBlock
    fm = RefAwareBlock(out_channels=3, nf=8, ref_nf=16, num_experts=4)
    variables = jax.tree_util.tree_map(
        jnp.asarray,
        RefAwareBlock.variables_from_torch(
            {k: v.numpy() for k, v in tm.state_dict().items()}))

    rng = np.random.RandomState(11)
    x = rng.rand(2, 10, 12, 8).astype(np.float32)
    ref = rng.rand(2, 10, 12, 16).astype(np.float32)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    rt = torch.from_numpy(np.ascontiguousarray(ref.transpose(0, 3, 1, 2)))

    for orig in (None, (6, 9)):
        with torch.no_grad():
            out_t = tm(xt, rt, orig).numpy().transpose(0, 2, 3, 1)
        out_j = np.asarray(fm.apply(variables, jnp.asarray(x),
                                    jnp.asarray(ref), orig))
        assert out_j.shape == out_t.shape
        np.testing.assert_allclose(out_j, out_t, atol=1e-5)
