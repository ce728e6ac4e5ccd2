"""Parity for the second arch batch: ECBSR, RIDNet, TOFlow, DUF."""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo/tests')

from mrefsr_tpu.convert import torch_to_flax
from test_archs.test_arch_parity import _stub_basicsr


@pytest.fixture(scope='module')
def ref_loader():
    return _stub_basicsr()


def _convert(torch_model, rename=None):
    torch_model.eval()
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = torch_to_flax(sd, rename=rename)
    return jax.tree_util.tree_map(jnp.asarray, variables)


def test_ecbsr_parity(ref_loader):
    ref = ref_loader('basicsr.archs.ecbsr_arch',
                     'basicsr/archs/ecbsr_arch.py')
    from mrefsr_tpu.archs.ecbsr_arch import ECBSR
    tm = ref.ECBSR(num_in_ch=3, num_out_ch=3, num_block=2, num_channel=8,
                   with_idt=True, act_type='prelu', scale=2)
    fm = ECBSR(num_in_ch=3, num_out_ch=3, num_block=2, num_channel=8,
               with_idt=True, act_type='prelu', scale=2)
    x = np.random.RandomState(0).rand(1, 12, 12, 3).astype(np.float32)
    variables = _convert(tm)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_j = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out_j, out_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_ecbsr_single_channel(ref_loader):
    ref = ref_loader('basicsr.archs.ecbsr_arch',
                     'basicsr/archs/ecbsr_arch.py')
    from mrefsr_tpu.archs.ecbsr_arch import ECBSR
    tm = ref.ECBSR(num_in_ch=1, num_out_ch=1, num_block=1, num_channel=8,
                   with_idt=False, act_type='prelu', scale=4)
    fm = ECBSR(num_in_ch=1, num_out_ch=1, num_block=1, num_channel=8,
               with_idt=False, act_type='prelu', scale=4)
    x = np.random.RandomState(1).rand(2, 8, 8, 1).astype(np.float32)
    variables = _convert(tm)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_j = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out_j, out_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_ridnet_parity(ref_loader):
    ref = ref_loader('basicsr.archs.ridnet_arch',
                     'basicsr/archs/ridnet_arch.py')
    from mrefsr_tpu.archs.ridnet_arch import RIDNet
    tm = ref.RIDNet(3, 16, 3, num_block=2)
    fm = RIDNet(3, 16, 3, num_block=2)
    x = np.random.RandomState(2).rand(1, 16, 16, 3).astype(np.float32)
    variables = _convert(tm)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_j = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out_j, out_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_toflow_parity(ref_loader):
    ref = ref_loader('basicsr.archs.tof_arch', 'basicsr/archs/tof_arch.py')
    from mrefsr_tpu.archs.tof_arch import TOFlow
    tm = ref.TOFlow()
    fm = TOFlow()
    x = np.random.RandomState(3).rand(1, 7, 32, 32, 3).astype(np.float32)
    rename = lambda k: None if k in ('mean', 'std') else k
    variables = _convert(tm, rename=rename)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)))
    out_j = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out_j, out_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_duf_parity(ref_loader):
    ref = ref_loader('basicsr.archs.duf_arch', 'basicsr/archs/duf_arch.py')
    from mrefsr_tpu.archs.duf_arch import DUF
    tm = ref.DUF(scale=4, num_layer=16)
    fm = DUF(scale=4, num_layer=16)
    x = np.random.RandomState(4).rand(1, 7, 8, 8, 3).astype(np.float32)
    variables = _convert(tm)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)))
    out_j = np.asarray(fm.apply(variables, jnp.asarray(x)))
    assert out_j.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(out_j, out_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_ecbsr_edge_masks_receive_no_gradient():
    """Regression: the fixed Sobel/Laplacian masks were plain trainable
    params; the reference registers them with requires_grad=False
    (ecbsr_arch.py:57/79/100)."""
    import jax

    from mrefsr_tpu.archs.ecbsr_arch import ECBSR
    net = ECBSR(num_in_ch=1, num_out_ch=1, num_block=1, num_channel=4,
                with_idt=False, act_type='prelu', scale=2)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 1).astype(
        np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return net.apply({'params': params}, x).sum()

    grads = jax.grad(loss)(variables['params'])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    mask_grads = [(path, g) for path, g in flat
                  if 'mask' in '.'.join(str(getattr(k, 'key', k))
                                        for k in path)]
    assert mask_grads, 'expected mask params in the tree'
    for path, g in mask_grads:
        assert np.allclose(np.asarray(g), 0), path
    scale_grads = [g for path, g in flat
                   if 'scale' in '.'.join(str(getattr(k, 'key', k))
                                          for k in path)]
    assert any(not np.allclose(np.asarray(g), 0) for g in scale_grads)
