"""SpyNet / EDVR / BasicVSR parity vs reference archs (torch-DCN stub)."""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo/tests')
from test_arch_parity import _stub_basicsr  # noqa: E402

from mrefsr_tpu.convert import torch_to_flax  # noqa: E402

RNG = np.random.RandomState(5)


@pytest.fixture(scope='module')
def loader():
    return _stub_basicsr()


def _convert(tm, rename=None):
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    return jax.tree_util.tree_map(jnp.asarray,
                                  torch_to_flax(sd, rename=rename))


def _drop_buffers(key):
    if key.endswith('.mean') or key.endswith('.std'):
        return None
    return key


def test_spynet_parity(loader):
    ref = loader('basicsr.archs.spynet_arch',
                 'basicsr/archs/spynet_arch.py')
    from mrefsr_tpu.archs.spynet_arch import SpyNet
    torch.manual_seed(0)
    tm = ref.SpyNet(load_path=None)
    tm.eval()
    fm = SpyNet()

    a = RNG.rand(1, 64, 64, 3).astype(np.float32)
    b = RNG.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                   torch.from_numpy(b.transpose(0, 3, 1, 2)))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    variables = _convert(tm, rename=_drop_buffers)
    out_j = np.asarray(fm.apply(variables, jnp.asarray(a),
                                jnp.asarray(b)))
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=1e-4)


def test_edvr_parity(loader):
    ref = loader('basicsr.archs.edvr_arch', 'basicsr/archs/edvr_arch.py')
    from mrefsr_tpu.archs.edvr_arch import EDVR
    torch.manual_seed(1)
    kwargs = dict(num_in_ch=3, num_out_ch=3, num_feat=8, num_frame=3,
                  deformable_groups=2, num_extract_block=1,
                  num_reconstruct_block=1, with_tsa=True)
    tm = ref.EDVR(**kwargs)
    tm.eval()
    fm = EDVR(**kwargs)

    x = RNG.rand(1, 3, 16, 16, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 1, 4, 2, 3))
    with torch.no_grad():
        out_t = tm(xt).numpy().transpose(0, 2, 3, 1)

    variables = _convert(tm)
    out_j = np.asarray(fm.apply(variables, jnp.asarray(x)))
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=2e-4)


def test_edvr_no_tsa_parity(loader):
    ref = loader('basicsr.archs.edvr_arch', 'basicsr/archs/edvr_arch.py')
    from mrefsr_tpu.archs.edvr_arch import EDVR
    torch.manual_seed(2)
    kwargs = dict(num_feat=8, num_frame=3, deformable_groups=2,
                  num_extract_block=1, num_reconstruct_block=1,
                  with_tsa=False)
    tm = ref.EDVR(**kwargs)
    tm.eval()
    fm = EDVR(**kwargs)

    x = RNG.rand(1, 3, 8, 8, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 1, 4, 2, 3))
    with torch.no_grad():
        out_t = tm(xt).numpy().transpose(0, 2, 3, 1)
    variables = _convert(tm)
    out_j = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out_j, out_t, atol=2e-4)


def test_basicvsr_parity(loader):
    loader('basicsr.archs.edvr_arch', 'basicsr/archs/edvr_arch.py')
    loader('basicsr.archs.spynet_arch', 'basicsr/archs/spynet_arch.py')
    ref = loader('basicsr.archs.basicvsr_arch',
                 'basicsr/archs/basicvsr_arch.py')
    from mrefsr_tpu.archs.basicvsr_arch import BasicVSR
    torch.manual_seed(3)
    tm = ref.BasicVSR(num_feat=8, num_block=1)
    tm.eval()
    fm = BasicVSR(num_feat=8, num_block=1)

    x = RNG.rand(1, 3, 64, 64, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 1, 4, 2, 3))
    with torch.no_grad():
        out_t = tm(xt).numpy().transpose(0, 1, 3, 4, 2)
    variables = _convert(tm, rename=_drop_buffers)
    out_j = np.asarray(fm.apply(variables, jnp.asarray(x)))
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=2e-4)
