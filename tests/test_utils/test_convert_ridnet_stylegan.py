"""Key-layout round-trip tests for the RIDNet and StyleGAN2 checkpoint
converters (scripts/model_conversion/convert_ridnet.py,
convert_stylegan.py vs reference scripts/model_conversion/
convert_ridnet.py:16-19, convert_stylegan.py:6-66).

Same strategy as test_convert_models.py: build the real reference arch
(torch), derive the official key layout by transcribing the reference
converter's crt->ori rules verbatim, then check our converter
reproduces the arch's full state-dict key set and values exactly.
"""
import importlib.util
import sys
from collections import OrderedDict

import pytest
import torch

sys.path.insert(0, '/root/repo/tests/test_archs')
from test_arch_parity import _stub_basicsr  # noqa: E402


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        f'{name}_script', f'/root/repo/scripts/model_conversion/{name}.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def loader():
    return _stub_basicsr()


def test_ridnet_converter_positional_roundtrip(loader):
    """The official RIDNet checkpoint maps POSITIONALLY onto the
    reference arch's named_parameters (reference convert_ridnet.py:
    16-19). Our converter derives the target name list from the flax
    param tree — this asserts that list enumerates the exact same
    names in the exact same order as torch's named_parameters, so
    official tensor i lands on the same key either way."""
    mod = _load_script('convert_ridnet')
    ref = loader('basicsr.archs.ridnet_arch', 'basicsr/archs/ridnet_arch.py')
    torch.manual_seed(0)
    tm = ref.RIDNet(3, 64, 3)
    torch_names = [n for n, _ in tm.named_parameters()]
    # RIDNet has no buffers: state_dict order == named_parameters order
    assert torch_names == list(tm.state_dict())

    names = mod.ridnet_key_order()
    assert names == torch_names

    # value mapping: fake official checkpoint (renamed keys, same
    # positional order) must land tensor i on torch name i
    ori = OrderedDict((f'official.{i}', torch.randn(p.shape))
                      for i, (n, p) in enumerate(tm.named_parameters()))
    out = mod.convert_ridnet(ori, names)
    assert list(out) == torch_names
    for i, k in enumerate(torch_names):
        assert torch.equal(out[k], ori[f'official.{i}']), k
    with pytest.raises(ValueError):
        mod.convert_ridnet(OrderedDict(list(ori.items())[:-1]), names)


def _rosinality_g_key(crt_k, shape):
    """Reference-layout generator key -> rosinality key: verbatim
    transcription of reference convert_stylegan.py:9-36."""
    if 'style_mlp' in crt_k:
        return crt_k.replace('style_mlp', 'style')
    if 'constant_input.weight' in crt_k:
        return crt_k.replace('constant_input.weight', 'input.input')
    if 'style_conv1.modulated_conv' in crt_k:
        return crt_k.replace('style_conv1.modulated_conv', 'conv1.conv')
    if 'style_conv1' in crt_k:
        if tuple(shape) == (1,):
            return crt_k.replace('style_conv1', 'conv1.noise')
        return crt_k.replace('style_conv1', 'conv1')
    if 'style_convs' in crt_k:
        k = crt_k.replace('style_convs', 'convs').replace(
            'modulated_conv', 'conv')
        if tuple(shape) == (1,):
            k = k.replace('.weight', '.noise.weight')
        return k
    if 'to_rgb1.modulated_conv' in crt_k:
        return crt_k.replace('to_rgb1.modulated_conv', 'to_rgb1.conv')
    if 'to_rgbs' in crt_k:
        return crt_k.replace('modulated_conv', 'conv')
    if 'noises' in crt_k:
        return crt_k.replace('.noise', '.noise_')
    return crt_k


def _make_ref_g_and_fake_ori(ref_sg2_mod, seed=0):
    torch.manual_seed(seed)
    g = ref_sg2_mod.StyleGAN2Generator(32, num_style_feat=32, num_mlp=2,
                                       channel_multiplier=1, narrow=0.25)
    crt = g.state_dict()
    ori = {}
    for k, v in crt.items():
        ok = _rosinality_g_key(k, v.shape)
        assert ok not in ori, f'collision at {ok}'
        ori[ok] = torch.randn(v.shape)
    return crt, ori


@pytest.fixture(scope='module')
def ref_sg2():
    from test_stylegan2_parity import ref_sg2 as fixture_fn
    # reuse the parity test's stubbed loader body directly
    return fixture_fn.__wrapped__()


def test_stylegan_converter_g_roundtrip(ref_sg2):
    mod = _load_script('convert_stylegan')
    crt, ori = _make_ref_g_and_fake_ori(ref_sg2)
    shapes = {k: tuple(v.shape) for k, v in crt.items()}
    out = mod.convert_net_g(ori, shapes)
    assert set(out) == set(crt)
    for k in crt:
        expect = ori[_rosinality_g_key(k, crt[k].shape)]
        assert torch.equal(out[k], expect), k
    # shape mismatch must raise, not silently mis-assign
    bad = dict(ori)
    bad['style.1.weight'] = torch.randn(3, 3)
    with pytest.raises((ValueError, KeyError)):
        mod.convert_net_g(bad, shapes)


def test_stylegan_converter_d_roundtrip(ref_sg2):
    mod = _load_script('convert_stylegan')
    torch.manual_seed(1)
    d = ref_sg2.StyleGAN2Discriminator(32, channel_multiplier=1,
                                       narrow=0.25)
    crt = d.state_dict()
    ori = {}
    for k, v in crt.items():
        ok = k.replace('conv_body', 'convs') if 'conv_body' in k else k
        assert ok not in ori
        ori[ok] = torch.randn(v.shape)
    out = mod.convert_net_d(ori, {k: tuple(v.shape)
                                  for k, v in crt.items()})
    assert set(out) == set(crt)
    for k in crt:
        ok = k.replace('conv_body', 'convs') if 'conv_body' in k else k
        assert torch.equal(out[k], ori[ok]), k


def test_stylegan_converter_cli(ref_sg2, tmp_path):
    """The script end-to-end: rosinality {g_ema, d} + a reference-layout
    checkpoint -> {params_ema, params} .pth."""
    import subprocess
    mod_crt, ori_g = _make_ref_g_and_fake_ori(ref_sg2, seed=2)
    torch.manual_seed(3)
    d = ref_sg2.StyleGAN2Discriminator(32, channel_multiplier=1,
                                       narrow=0.25)
    crt_d = d.state_dict()
    ori_d = {(k.replace('conv_body', 'convs') if 'conv_body' in k
              else k): torch.randn(v.shape) for k, v in crt_d.items()}
    torch.save({'g_ema': ori_g, 'd': ori_d}, tmp_path / 'ori.pt')
    torch.save({'params_ema': mod_crt, 'params': crt_d},
               tmp_path / 'layout.pth')
    proc = subprocess.run(
        [sys.executable, 'scripts/model_conversion/convert_stylegan.py',
         '--ori', str(tmp_path / 'ori.pt'),
         '--layout', str(tmp_path / 'layout.pth'),
         '--save', str(tmp_path / 'out.pth')],
        cwd='/root/repo', capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = torch.load(tmp_path / 'out.pth', weights_only=True)
    assert set(out) == {'params_ema', 'params'}
    assert set(out['params_ema']) == set(mod_crt)
    for k in mod_crt:
        assert torch.equal(out['params_ema'][k],
                           ori_g[_rosinality_g_key(k, mod_crt[k].shape)])
    assert set(out['params']) == set(crt_d)
