"""BasicVSR++ forward parity vs the reference arch (torch CPU, with a
pure-torch deform_conv2d standing in for torchvision's CUDA op)."""
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mrefsr_tpu.archs.basicvsrpp_arch import BasicVSRPlusPlus
from mrefsr_tpu.convert import torch_to_flax
from torch_dcn_stub import torch_modulated_deform_conv2d

REF = '/root/reference'


def _tv_deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                      padding=(0, 0), dilation=(1, 1), mask=None):
    """torchvision.ops.deform_conv2d API -> mmcv-layout stub. Both use
    offset channels ordered (g, tap, (dy, dx))."""
    dg = offset.shape[1] // (2 * weight.shape[2] * weight.shape[3])
    return torch_modulated_deform_conv2d(
        input, offset, mask, weight, bias, stride, padding, dilation, 1,
        dg)


class _TorchModulatedDeformConvPack(torch.nn.Module):
    """Just enough of mmcv ModulatedDeformConvPack for the reference's
    SecondOrderDeformableAlignment subclass (it replaces conv_offset and
    calls torchvision.ops.deform_conv2d itself)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deformable_groups=1,
                 bias=True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kernel_size, kernel_size)
        self.stride = (stride, stride)
        self.padding = (padding, padding)
        self.dilation = (dilation, dilation)
        self.groups = groups
        self.deformable_groups = deformable_groups
        self.weight = torch.nn.Parameter(
            torch.empty(out_channels, in_channels // groups, kernel_size,
                        kernel_size))
        self.bias = torch.nn.Parameter(torch.zeros(out_channels))
        torch.nn.init.kaiming_uniform_(self.weight, a=1)


@pytest.fixture(scope='module')
def ref_vsrpp():
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
    utils_pkg.get_root_logger = lambda *a, **k: types.SimpleNamespace(
        info=lambda *a, **k: None, warning=lambda *a, **k: None)
    sys.modules['basicsr'] = pkg
    sys.modules['basicsr.utils'] = utils_pkg
    sys.modules['basicsr.utils.registry'] = registry

    dcn_stub = types.ModuleType('basicsr.ops.dcn')
    dcn_stub.ModulatedDeformConvPack = _TorchModulatedDeformConvPack
    dcn_stub.modulated_deform_conv = torch_modulated_deform_conv2d
    ops_pkg = types.ModuleType('basicsr.ops')
    sys.modules['basicsr.ops'] = ops_pkg
    sys.modules['basicsr.ops.dcn'] = dcn_stub

    tv = types.ModuleType('torchvision')
    tv.__version__ = '0.15.0'
    tv.ops = types.SimpleNamespace(deform_conv2d=_tv_deform_conv2d)
    sys.modules['torchvision'] = tv
    sys.modules['torchvision.ops'] = tv.ops

    arch_util = _load('basicsr.archs.arch_util',
                      'basicsr/archs/arch_util.py')
    archs_pkg = types.ModuleType('basicsr.archs')
    archs_pkg.arch_util = arch_util
    archs_pkg.__path__ = [f'{REF}/basicsr/archs']
    sys.modules['basicsr.archs'] = archs_pkg
    spynet = _load('basicsr.archs.spynet_arch',
                   'basicsr/archs/spynet_arch.py')
    archs_pkg.spynet_arch = spynet
    basicvsr = _load('basicsr.archs.basicvsr_arch',
                     'basicsr/archs/basicvsr_arch.py')
    archs_pkg.basicvsr_arch = basicvsr
    mod = _load('_ref_basicvsrpp', 'basicsr/archs/basicvsrpp_arch.py')
    return mod


@pytest.mark.slow  # ~50s compile-heavy parity (r4 suite rebalance)
def test_basicvsrpp_parity(ref_vsrpp):
    torch.manual_seed(0)
    # force the "CUDA available" branch so alignment modules are built
    orig = torch.cuda.is_available
    torch.cuda.is_available = lambda: True
    try:
        ref = ref_vsrpp.BasicVSRPlusPlus(mid_channels=8, num_blocks=1,
                                         spynet_path=None)
    finally:
        torch.cuda.is_available = orig
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = torch_to_flax(sd)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    mine = BasicVSRPlusPlus(mid_channels=8, num_blocks=1)

    rng = np.random.RandomState(1)
    x = rng.rand(1, 3, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        out_t = ref(torch.from_numpy(
            x.transpose(0, 1, 4, 2, 3)).contiguous())
    out_t = out_t.numpy().transpose(0, 1, 3, 4, 2)

    out_j = np.asarray(mine.apply(variables, jnp.asarray(x)))
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=2e-4)
