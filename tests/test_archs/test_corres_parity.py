"""Correspondence-generation parity: my vmapped compute_pre_offsets vs a
composition of the reference's matching + flow + shift pieces."""
import importlib.util
import sys

import numpy as np
import torch

import jax.numpy as jnp

sys.path.insert(0, '/root/repo/tests')
from test_arch_parity import _stub_basicsr  # noqa: E402

from mrefsr_tpu.archs.corres_generation_arch import compute_pre_offsets


def test_pre_offsets_match_reference_pipeline():
    loader = _stub_basicsr()
    ref_map_util = loader('basicsr.archs.ref_map_util',
                          'basicsr/archs/ref_map_util.py')
    arch_util = sys.modules['basicsr.archs.arch_util']

    # corres_generation_arch imports vgg_arch (torchvision download) — stub
    # it; we only exercise index_to_flow, which doesn't touch VGG.
    import types as _types
    vgg_stub = _types.ModuleType('basicsr.archs.vgg_arch')
    vgg_stub.VGGFeatureExtractor = object
    sys.modules['basicsr.archs.vgg_arch'] = vgg_stub
    ref_mod = loader('basicsr.archs.corres_generation_arch',
                     'basicsr/archs/corres_generation_arch.py')
    CGA = ref_mod.CorrespondenceGenerationArch

    rng = np.random.RandomState(7)
    c, h, w = 8, 10, 12
    feat_in = rng.rand(h, w, c).astype(np.float32)
    feat_ref = rng.rand(h, w, c).astype(np.float32)

    # reference pipeline (corres_generation_arch.py:53-105), single sample
    t_in = torch.from_numpy(feat_in.transpose(2, 0, 1))
    t_ref = torch.from_numpy(feat_ref.transpose(2, 0, 1))
    t_in_n = torch.nn.functional.normalize(t_in.reshape(c, -1),
                                           dim=0).view(c, h, w)
    t_ref_n = torch.nn.functional.normalize(t_ref.reshape(c, -1),
                                            dim=0).view(c, h, w)
    max_idx, _ = ref_map_util.feature_match_index(
        t_in_n, t_ref_n, patch_size=3, input_stride=1, ref_stride=1,
        is_norm=True, norm_input=True)

    offset_relu3 = CGA.index_to_flow(None, max_idx)
    ref_levels = {}
    shifted = [arch_util.tensor_shift(offset_relu3, (i, j))
               for i in range(3) for j in range(3)]
    ref_levels['relu3_1'] = torch.cat(shifted, dim=0).numpy()
    offset_relu2 = torch.repeat_interleave(
        torch.repeat_interleave(offset_relu3, 2, 1), 2, 2) * 2
    shifted = [arch_util.tensor_shift(offset_relu2, (i * 2, j * 2))
               for i in range(3) for j in range(3)]
    ref_levels['relu2_1'] = torch.cat(shifted, dim=0).numpy()
    offset_relu1 = torch.repeat_interleave(
        torch.repeat_interleave(offset_relu3, 4, 1), 4, 2) * 4
    shifted = [arch_util.tensor_shift(offset_relu1, (i * 4, j * 4))
               for i in range(3) for j in range(3)]
    ref_levels['relu1_1'] = torch.cat(shifted, dim=0).numpy()

    # mine (single sample; batch handled by vmap in the arch)
    mine = compute_pre_offsets(jnp.asarray(feat_in), jnp.asarray(feat_ref))

    for level in ['relu3_1', 'relu2_1', 'relu1_1']:
        # reference: (9, h, w, 2); mine: (h, w, 9, 2)
        theirs = ref_levels[level]
        got = np.asarray(mine[level]).transpose(2, 0, 1, 3)
        assert got.shape == theirs.shape, (level, got.shape, theirs.shape)
        np.testing.assert_allclose(got, theirs, atol=1e-4,
                                   err_msg=level)
