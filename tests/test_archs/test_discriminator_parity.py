"""Discriminator parity + train-mode semantics: UNetDiscriminatorSN's
spectral norm (reference wraps conv1..conv8), ImageDiscriminator /
VGGStyleDiscriminator BatchNorm train behavior."""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo/tests')

from mrefsr_tpu.convert import torch_to_flax

from test_arch_parity import _stub_basicsr  # noqa: E402

RNG = np.random.RandomState(11)


@pytest.fixture(scope='module')
def ref_disc():
    load = _stub_basicsr()
    return load('basicsr.archs.discriminator_arch',
                'basicsr/archs/discriminator_arch.py')


def _convert(torch_model):
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = torch_to_flax(sd)
    return jax.tree_util.tree_map(jnp.asarray, variables)


def test_unet_discriminator_sn_pth_parity(ref_disc):
    """Eval parity with imported weight_orig/u/v: torch spectral_norm at
    eval computes W/sigma from the STORED power-iteration vectors —
    regression: the port had no SN at all (raw kernels, off by 1/sigma
    per layer, and reference .pth files could not import)."""
    torch.manual_seed(0)
    tm = ref_disc.UNetDiscriminatorSN(num_in_ch=3, num_feat=8).eval()
    x = RNG.rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        # a couple of train-mode forwards so u/v leave their random init
        tm.train()
        tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        tm.eval()
        out_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    from mrefsr_tpu.archs.discriminator_arch import UNetDiscriminatorSN
    variables = _convert(tm)
    assert 'spectral' in variables  # u/v imported
    out_j = np.asarray(UNetDiscriminatorSN(num_in_ch=3, num_feat=8).apply(
        variables, jnp.asarray(x)))
    np.testing.assert_allclose(out_j, out_t, atol=2e-4)


def test_unet_discriminator_power_iteration_updates():
    from mrefsr_tpu.archs.discriminator_arch import UNetDiscriminatorSN
    net = UNetDiscriminatorSN(num_in_ch=3, num_feat=8)
    x = jnp.asarray(RNG.rand(1, 16, 16, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    _, updates = net.apply(variables, x, mutable=['spectral'])
    u0 = variables['spectral']['conv1']['u']
    u1 = updates['spectral']['conv1']['u']
    assert not np.allclose(np.asarray(u0), np.asarray(u1))


def test_image_discriminator_pth_parity_and_train_mode(ref_disc):
    """Eval parity vs the reference + train-mode BN actually normalizes
    by batch statistics (regression: BN ran frozen on init stats
    through the whole GAN phase)."""
    torch.manual_seed(1)
    tm = ref_disc.ImageDiscriminator(in_nc=3, ndf=4).eval()
    x = RNG.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    from mrefsr_tpu.archs.discriminator_arch import ImageDiscriminator
    variables = _convert(tm)
    net = ImageDiscriminator(in_nc=3, ndf=4)
    out_j = np.asarray(net.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out_j, out_t, atol=1e-4)

    # train mode normalizes by batch stats -> differs from frozen-stats
    # eval, and writes updated running stats
    out_train, updates = net.apply(variables, jnp.asarray(x), train=True,
                                   mutable=['batch_stats'])
    assert not np.allclose(np.asarray(out_train), out_j)
    m0 = variables['batch_stats']['conv_block1.1']['mean']
    m1 = updates['batch_stats']['conv_block1.1']['mean']
    assert not np.allclose(np.asarray(m0), np.asarray(m1))


def test_vgg_style_discriminator_train_mode():
    from mrefsr_tpu.archs.discriminator_arch import VGGStyleDiscriminator
    net = VGGStyleDiscriminator(num_in_ch=3, num_feat=4, input_size=160)
    x = jnp.asarray(RNG.rand(2, 160, 160, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    out_eval = net.apply(variables, x)
    out_train, updates = net.apply(variables, x, train=True,
                                   mutable=['batch_stats'])
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))
    assert 'batch_stats' in updates
