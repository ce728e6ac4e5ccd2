"""Patch-correlation matching parity vs the reference ref_map_util
(torch), plus index_to_flow/tensor_shift parity."""
import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mrefsr_tpu.ops import (feature_match_index, index_to_flow,
                            sample_patches, tensor_shift)


def load_ref_map_util():
    spec = importlib.util.spec_from_file_location(
        '_ref_map_util', '/root/reference/basicsr/archs/ref_map_util.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


RNG = np.random.RandomState(3)


@pytest.mark.parametrize('is_norm,norm_input', [(True, True), (True, False),
                                                (False, False)])
def test_feature_match_index_parity(is_norm, norm_input):
    ref_mod = load_ref_map_util()
    c, h, w = 8, 12, 14
    feat_in = RNG.rand(h, w, c).astype(np.float32)
    feat_ref = RNG.rand(h, w, c).astype(np.float32)

    idx_mine, val_mine = feature_match_index(
        jnp.asarray(feat_in), jnp.asarray(feat_ref), patch_size=3,
        is_norm=is_norm, norm_input=norm_input, chunk=32)

    t_in = torch.from_numpy(feat_in.transpose(2, 0, 1))
    t_ref = torch.from_numpy(feat_ref.transpose(2, 0, 1))
    idx_ref, val_ref = ref_mod.feature_match_index(
        t_in, t_ref, patch_size=3, input_stride=1, ref_stride=1,
        is_norm=is_norm, norm_input=norm_input)

    idx_mine = np.asarray(idx_mine)
    idx_ref = idx_ref.numpy()
    # fp near-ties can flip the argmax between accumulation orders; require
    # the best scores to agree everywhere and indices to agree almost
    # everywhere.
    agree = (idx_mine == idx_ref).mean()
    assert agree > 0.97, f'only {agree:.2%} of match indices agree'
    np.testing.assert_allclose(np.asarray(val_mine), val_ref.numpy(),
                               atol=1e-4)


def test_sample_patches_count():
    feat = jnp.asarray(RNG.rand(10, 11, 4).astype(np.float32))
    p = sample_patches(feat, 3, 1)
    assert p.shape == (8 * 9, 36)


def test_index_to_flow_matches_reference_semantics():
    """flow = matched pos - own pos, (x, y) order, padded by 2."""
    h, w = 4, 5
    max_idx = np.arange(h * w).reshape(h, w)  # identity matching
    flow = np.asarray(index_to_flow(jnp.asarray(max_idx)))
    assert flow.shape == (h + 2, w + 2, 2)
    np.testing.assert_array_equal(flow[:h, :w], 0)

    # a non-trivial match: every input matches ref patch (1, 2)
    max_idx2 = np.full((h, w), 1 * w + 2)
    flow2 = np.asarray(index_to_flow(jnp.asarray(max_idx2)))
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    np.testing.assert_array_equal(flow2[:h, :w, 0], 2 - gx)
    np.testing.assert_array_equal(flow2[:h, :w, 1], 1 - gy)


def test_tensor_shift():
    x = RNG.rand(5, 6, 2).astype(np.float32)
    out = np.asarray(tensor_shift(jnp.asarray(x), (1, 2)))
    np.testing.assert_array_equal(out[:1], 0)
    np.testing.assert_array_equal(out[:, :2], 0)
    np.testing.assert_allclose(out[1:, 2:], x[:4, :4])
