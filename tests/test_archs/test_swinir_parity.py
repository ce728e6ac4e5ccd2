"""SwinIR parity vs the reference arch with converted weights."""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo/tests')
from test_arch_parity import _stub_basicsr  # noqa: E402

from mrefsr_tpu.convert import torch_to_flax  # noqa: E402


def _drop_buffers(key):
    if key.endswith('relative_position_index') or \
            key.endswith('attn_mask'):
        return None
    return key


@pytest.fixture(scope='module')
def ref_swinir(request):
    loader = _stub_basicsr()
    return loader('basicsr.archs.swinir_arch',
                  'basicsr/archs/swinir_arch.py')


@pytest.mark.parametrize('upsampler,upscale', [('pixelshuffle', 2),
                                               ('pixelshuffledirect', 2),
                                               ('', 1)])
def test_swinir_parity(ref_swinir, upsampler, upscale):
    from mrefsr_tpu.archs.swinir_arch import SwinIR
    kwargs = dict(img_size=16, patch_size=1, in_chans=3, embed_dim=8,
                  depths=(2, 2), num_heads=(2, 2), window_size=4,
                  mlp_ratio=2., upscale=upscale, img_range=1.,
                  upsampler=upsampler, resi_connection='1conv')
    torch.manual_seed(0)
    tm = ref_swinir.SwinIR(**kwargs)
    tm.eval()
    fm = SwinIR(**kwargs)

    x = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray, torch_to_flax(sd, rename=_drop_buffers))
    out_j = np.asarray(fm.apply(variables, jnp.asarray(x)))

    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=5e-4)


def test_swinir_drop_path_active_with_rng():
    """Regression: drop_path_rate was accepted and silently ignored —
    training SwinIR from scratch omitted the reference's stochastic
    depth. With a 'droppath' rng supplied, residual branches drop
    per-sample; without one (inference) the forward is deterministic
    identity."""
    from mrefsr_tpu.archs.swinir_arch import SwinIR
    kwargs = dict(img_size=16, patch_size=1, in_chans=3, embed_dim=8,
                  depths=(2, 2), num_heads=(2, 2), window_size=4,
                  mlp_ratio=2., upscale=2, img_range=1.,
                  upsampler='pixelshuffledirect', drop_path_rate=0.9)
    net = SwinIR(**kwargs)
    x = jnp.asarray(
        np.random.RandomState(3).rand(2, 16, 16, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    out_det = net.apply(variables, x)
    out_det2 = net.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(out_det),
                                  np.asarray(out_det2))
    out_dp = net.apply(variables, x,
                       rngs={'droppath': jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(out_dp), np.asarray(out_det))
