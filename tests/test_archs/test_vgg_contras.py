"""VGG tower parity vs a torch-built VGG, and extractor smoke tests."""
import sys

import numpy as np
import torch
import torch.nn as nn_t

import jax
import jax.numpy as jnp

from mrefsr_tpu.archs.contras_extractor_arch import ContrasMultiExtractorSep
from mrefsr_tpu.archs.corres_generation_arch import \
    CorrespondenceGenerationArch
from mrefsr_tpu.archs.vgg_arch import NAMES, VGGFeatureExtractor, vgg_rename
from mrefsr_tpu.convert import torch_to_flax

RNG = np.random.RandomState(11)


def build_torch_vgg(vgg_type, last_layer):
    """Assemble the standard VGG feature tower in torch from the public
    layer roster (conv3x3+relu blocks with 2x2 maxpools)."""
    names = NAMES[vgg_type]
    layers = []
    in_ch = 3
    for name in names[:names.index(last_layer) + 1]:
        if name.startswith('conv'):
            out_ch = {1: 64, 2: 128, 3: 256, 4: 512, 5: 512}[int(name[4])]
            layers.append(nn_t.Conv2d(in_ch, out_ch, 3, 1, 1))
            in_ch = out_ch
        elif name.startswith('relu'):
            layers.append(nn_t.ReLU())
        elif name.startswith('pool'):
            layers.append(nn_t.MaxPool2d(2, 2))
    return nn_t.Sequential(*layers)


def test_vgg_feature_extractor_parity():
    torch.manual_seed(0)
    tower = build_torch_vgg('vgg19', 'relu3_1')
    tower.eval()

    # emulate a torchvision state dict: features.<idx>.weight
    sd = {f'features.{i}.{leaf}': p.detach().numpy()
          for i, m in enumerate(tower)
          if isinstance(m, nn_t.Conv2d)
          for leaf, p in [('weight', m.weight), ('bias', m.bias)]}
    variables = jax.tree_util.tree_map(
        jnp.asarray, torch_to_flax(sd, rename=vgg_rename('vgg19')))

    fm = VGGFeatureExtractor(layer_name_list=('relu1_1', 'relu2_1',
                                              'relu3_1'), vgg_type='vgg19')
    x = RNG.rand(1, 32, 32, 3).astype(np.float32)

    # reference normalization (vgg_arch.py:135-153)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    xt = (torch.from_numpy(x.transpose(0, 3, 1, 2)) - mean) / std
    taps = {}
    names = NAMES['vgg19']
    with torch.no_grad():
        v = xt
        for name, layer in zip(names, tower):
            v = layer(v)
            if name in ('relu1_1', 'relu2_1', 'relu3_1'):
                taps[name] = v.numpy().transpose(0, 2, 3, 1)

    out = fm.apply(variables, jnp.asarray(x))
    for name in taps:
        np.testing.assert_allclose(np.asarray(out[name]), taps[name],
                                   atol=1e-4, err_msg=name)


def test_contras_multi_extractor_shapes():
    fm = ContrasMultiExtractorSep()
    img1 = jnp.asarray(RNG.rand(2, 32, 32, 3).astype(np.float32))
    refs = jnp.asarray(RNG.rand(2, 5, 32, 32, 3).astype(np.float32))
    variables = fm.init(jax.random.PRNGKey(0), img1, refs)
    out = fm.apply(variables, img1, refs)
    assert out['dense_features1'].shape == (2, 8, 8, 256)
    assert out['dense_features2'].shape == (2, 5, 8, 8, 256)


def test_corres_generation_arch_shapes():
    fm = CorrespondenceGenerationArch()
    feats = {
        'dense_features1': jnp.asarray(
            RNG.rand(1, 10, 10, 8).astype(np.float32)),
        'dense_features2': jnp.asarray(
            RNG.rand(1, 10, 10, 8).astype(np.float32)),
    }
    img_ref_hr = jnp.asarray(RNG.rand(1, 40, 40, 3).astype(np.float32))
    variables = fm.init(jax.random.PRNGKey(0), feats, img_ref_hr)
    pre_offset, img_ref_feat = fm.apply(variables, feats, img_ref_hr)
    assert pre_offset['relu3_1'].shape == (1, 10, 10, 9, 2)
    assert pre_offset['relu2_1'].shape == (1, 20, 20, 9, 2)
    assert pre_offset['relu1_1'].shape == (1, 40, 40, 9, 2)
    assert img_ref_feat['relu1_1'].shape == (1, 40, 40, 64)
    assert img_ref_feat['relu2_1'].shape == (1, 20, 20, 128)
    assert img_ref_feat['relu3_1'].shape == (1, 10, 10, 256)
