"""Full-pipeline forward parity at eval-style resolution: the exact
chain the reference's MultiRefRestorationModel.test() runs
(reference basicsr/models/multi_ref_restoration_model.py:281-294):

    net_extractor (ContrasMultiExtractorSep, VGG16-conv3_1)
      -> per-ref net_map (CorrespondenceGenerationArch: dense patch
         matching -> flow -> 9-tap offsets; VGG19 HR-ref features)
        -> net_g (MRAPARestorationNet, full ngf=64 / groups=8 widths)

against our jitted chain (__graft_entry__._forward_fn — the very
function the driver compile-checks), with random weights converted
through mrefsr_tpu.convert. The reference side runs pure-torch on CPU:
torchvision VGG towers and mmcv's DCN are stubbed with equivalent torch
implementations (tests/torch_dcn_stub.py pattern).

The slow suite runs BOTH the 160x160 dev canvas and the full 500x500
CUFED5 protocol canvas (reference basicsr/data/multi_ref_dataset.py:
174-180) — the 500 run passes at atol=2e-3 in ~6-23 min on CPU
(recorded round 3, uncontended vs fully loaded machine).
MREFSR_PARITY_CANVAS=<n> pins one canvas.
"""
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo/tests')
sys.path.insert(0, '/root/repo/tests/test_archs')
from test_arch_parity import _stub_basicsr  # noqa: E402
from test_mrapa_parity import _fake_logger_in, _install_mmcv_stub  # noqa: E402
from test_vgg_contras import build_torch_vgg  # noqa: E402

from mrefsr_tpu.convert import torch_to_flax  # noqa: E402

# Both the fast dev canvas AND the full CUFED5 protocol canvas (500,
# reference basicsr/data/multi_ref_dataset.py:174-180) run in the
# slow suite; MREFSR_PARITY_CANVAS pins a single canvas instead.
_CANVASES = ([int(os.environ['MREFSR_PARITY_CANVAS'])]
             if os.environ.get('MREFSR_PARITY_CANVAS')
             else [160, 500])


def _install_torchvision_vgg_stub():
    """Extend the bare torchvision stub with models.vgg.{vgg16,vgg19}
    factories returning random-weight towers in torchvision layout."""
    tv = sys.modules['torchvision']

    def _factory(vgg_type):
        def ctor(pretrained=False, **kw):
            from mrefsr_tpu.archs.vgg_arch import NAMES
            tower = build_torch_vgg(vgg_type, NAMES[vgg_type][-1])
            return types.SimpleNamespace(features=tower)
        return ctor

    vgg_mod = types.ModuleType('torchvision.models.vgg')
    vgg_mod.vgg16 = _factory('vgg16')
    vgg_mod.vgg19 = _factory('vgg19')
    models_mod = types.ModuleType('torchvision.models')
    models_mod.vgg = vgg_mod
    tv.models = models_mod
    sys.modules['torchvision.models'] = models_mod
    sys.modules['torchvision.models.vgg'] = vgg_mod


@pytest.fixture(scope='module')
def ref_mods():
    loader = _stub_basicsr()
    _install_mmcv_stub()
    _install_torchvision_vgg_stub()
    vgg_arch = loader('basicsr.archs.vgg_arch',
                      'basicsr/archs/vgg_arch.py')
    loader('basicsr.archs.ref_map_util', 'basicsr/archs/ref_map_util.py')
    contras = loader('basicsr.archs.contras_extractor_arch',
                     'basicsr/archs/contras_extractor_arch.py')
    sys.modules['basicsr.archs'].contras_extractor_arch = contras
    multi = loader('basicsr.archs.contras_multi_extractor_arch',
                   'basicsr/archs/contras_multi_extractor_arch.py')
    corres = loader('basicsr.archs.corres_generation_arch',
                    'basicsr/archs/corres_generation_arch.py')
    mrapa = loader('basicsr.archs.ref_mrapa_restoration_arch',
                   'basicsr/archs/ref_mrapa_restoration_arch.py')
    _fake_logger_in(mrapa)
    return vgg_arch, multi, corres, mrapa


def _drop_norm_buffers(key):
    """VGG input-norm mean/std live as torch buffers; ours are
    constants."""
    if key.endswith('.mean') or key.endswith('.std'):
        return None
    return key


@pytest.mark.slow
@pytest.mark.parametrize('canvas', _CANVASES)
def test_full_pipeline_forward_parity(ref_mods, canvas):
    _, multi_mod, corres_mod, mrapa_mod = ref_mods
    import __graft_entry__

    gt, b, t = canvas, 1, 5
    ngf, n_blocks, groups = 64, 16, 8

    torch.manual_seed(3)
    tm_ex = multi_mod.ContrasMultiExtractorSep()
    tm_map = corres_mod.CorrespondenceGenerationArch(
        patch_size=3, stride=1,
        vgg_layer_list=['relu1_1', 'relu2_1', 'relu3_1'],
        vgg_type='vgg19')
    tm_g = mrapa_mod.MRAPARestorationNet(ngf=ngf, n_blocks=n_blocks,
                                         groups=groups)
    for m in (tm_ex, tm_map, tm_g):
        m.eval()

    rng = np.random.RandomState(0)
    match_img = rng.rand(b, gt, gt, 3).astype(np.float32)
    refs = rng.rand(b, t, gt, gt, 3).astype(np.float32)
    lq = rng.rand(b, gt // 4, gt // 4, 3).astype(np.float32)

    # --- reference chain (multi_ref_restoration_model.py:284-294) ---
    match_t = torch.from_numpy(match_img.transpose(0, 3, 1, 2))
    refs_t = [torch.from_numpy(
        np.ascontiguousarray(refs[:, i].transpose(0, 3, 1, 2)))
        for i in range(t)]
    lq_t = torch.from_numpy(lq.transpose(0, 3, 1, 2))
    with torch.no_grad():
        feats_list = tm_ex(match_t, refs_t)
        pre_list, feat_list = [], []
        for features, img_ref in zip(feats_list, refs_t):
            pre_offset, img_ref_feat = tm_map(features, img_ref)
            pre_list.append(pre_offset)
            feat_list.append(img_ref_feat)
        out_t = tm_g(lq_t, pre_list, feat_list)
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    # --- our chain, weights converted from the same torch nets ---
    def conv(tm, rename=None):
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        return jax.tree_util.tree_map(jnp.asarray,
                                      torch_to_flax(sd, rename=rename))

    vars_ex = conv(tm_ex, rename=_drop_norm_buffers)
    vars_map = conv(tm_map, rename=_drop_norm_buffers)
    vars_g = conv(tm_g)

    extractor, net_map, net_g = __graft_entry__._flagship(
        ngf=ngf, n_blocks=n_blocks, groups=groups)
    forward = jax.jit(__graft_entry__._forward_fn(extractor, net_map,
                                                  net_g))
    out_j = np.asarray(forward(vars_ex, vars_map, vars_g,
                               jnp.asarray(match_img), jnp.asarray(refs),
                               jnp.asarray(lq)))

    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=2e-3)
