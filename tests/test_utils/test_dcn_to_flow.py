"""DCN->flow warm-start converter (convert.dcn_to_flow_state_dict).

The conversion basis: with the learned offset residual constant per
deform group and the pre-offset flow constant, DynAgg's 9-tap
deformable conv IS a 3x3 conv over the flow-warped ref (the pre-offset
taps are shifted copies of one flow, corres_generation_arch.py:28-36),
so the converted FlowAgg must reproduce the DCN model's output
EXACTLY. Smooth flows relax this to O(grad flow).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrefsr_tpu.archs import build_network
from mrefsr_tpu.convert import (dcn_to_flow_state_dict, flax_to_torch,
                                torch_to_flax)

DG = 4
K2 = 9


def _nets(ngf=16, n_blocks=2):
    common = dict(ngf=ngf, n_blocks=n_blocks, groups=DG)
    dcn = build_network(dict(type='MRAPARestorationNet',
                             alignment='dcn', **common))
    flow = build_network(dict(type='MRAPARestorationNet',
                              alignment='flow', **common))
    return dcn, flow


def _inputs(rng, b=1, t=2, h=6, w=8, const_flow=True):
    x = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    pre_offset, ref_feat = {}, {}
    for level, s, c in (('relu3_1', 1, 256), ('relu2_1', 2, 128),
                        ('relu1_1', 4, 64)):
        if const_flow:
            # one (x, y) flow per (b, t), constant over space and taps
            f = rng.uniform(-2, 2, (b, t, 1, 1, 1, 2))
            po = np.broadcast_to(f, (b, t, h * s, w * s, K2, 2))
        else:
            po = rng.uniform(-2, 2, (b, t, h * s, w * s, K2, 2))
        pre_offset[level] = jnp.asarray(po, jnp.float32)
        ref_feat[level] = jnp.asarray(
            rng.randn(b, t, h * s, w * s, c), jnp.float32)
    return x, pre_offset, ref_feat


def _perturb_dcn_params(params, rng):
    """Give the zero-init offset conv a conversion-exercising state:
    per-group constant offset biases (equal across taps, so the DCN
    shifts every tap alike — the case the flow head represents
    exactly) + random mask biases (folded via sigmoid into the conv).
    Offset/mask WEIGHTS stay zero (the feature-dependent parts the
    conversion documents as dropped)."""
    agg = params['dyn_agg_restore']
    for p in ('small', 'medium', 'large'):
        m = agg[f'{p}_dyn_agg']
        bias = np.zeros(3 * DG * K2, np.float32)
        for g in range(DG):
            v = rng.uniform(-1.5, 1.5, 2)
            for t in range(K2):
                bias[g * 2 * K2 + 2 * t] = v[0]
                bias[g * 2 * K2 + 2 * t + 1] = v[1]
        bias[2 * DG * K2:] = rng.randn(DG * K2).astype(np.float32)
        m['conv_offset_mask']['bias'] = jnp.asarray(bias)
    return params


def _convert_vars(vars_d):
    sd = flax_to_torch(vars_d['params'])
    sd_f = dcn_to_flow_state_dict(sd, deform_groups=DG)
    vars_f = torch_to_flax(sd_f)
    return jax.tree_util.tree_map(jnp.asarray, vars_f)


def test_warm_start_exact_on_constant_flow():
    rng = np.random.RandomState(0)
    net_d, net_f = _nets()
    x, pre, ref = _inputs(rng, const_flow=True)
    vars_d = net_d.init(jax.random.PRNGKey(0), x, pre, ref)
    vars_d = {'params': _perturb_dcn_params(
        jax.device_get(vars_d)['params'], rng)}

    out_d = np.asarray(net_d.apply(vars_d, x, pre, ref))
    out_f = np.asarray(net_f.apply(_convert_vars(vars_d), x, pre, ref))
    np.testing.assert_allclose(out_f, out_d, rtol=2e-4, atol=2e-4)


def test_module_level_interior_exact_border_differs():
    """DynAgg vs converted FlowAgg at MODULE level, constant flow
    (1.7, 1.7): the conversion is exact only for INTERIOR pixels. The
    1-px border band differs by construction — DynAgg bilinear-samples
    x directly at p + tap + flow (in-bounds even when p + tap alone is
    off-grid), while converted FlowAgg warps first and zero-pads the
    3x3 conv over the warped grid, so off-grid taps read 0 instead of
    the flow-displaced sample. The full-net tests cannot see this
    (small-init downstream convs attenuate the band); assert the split
    explicitly here so the documented exactness bound stays honest."""
    from mrefsr_tpu.archs.ref_mrapa_restoration_arch import DynAgg, \
        FlowAgg
    rng = np.random.RandomState(4)
    cin, cout, h, w = 8, 8, 12, 16
    net_d = DynAgg(in_channels=cin, out_channels=cout,
                   deform_groups=DG)
    net_f = FlowAgg(in_channels=cin, out_channels=cout,
                    deform_groups=DG)
    x = jnp.asarray(rng.randn(1, h, w, cin), jnp.float32)
    feat = jnp.asarray(rng.randn(1, h, w, cin), jnp.float32)
    flow = (1.7, 1.7)  # (x, y), constant over space and taps
    po = np.broadcast_to(np.asarray(flow, np.float32),
                         (1, h, w, K2, 2))
    po = jnp.asarray(po)

    vars_d = jax.device_get(net_d.init(jax.random.PRNGKey(0), x, feat,
                                       po))
    # random mask biases exercise the sigmoid fold; offset rows stay
    # zero (residual-free — the module-level exactness condition)
    params_d = vars_d['params']
    bias = np.zeros(3 * DG * K2, np.float32)
    bias[2 * DG * K2:] = rng.randn(DG * K2).astype(np.float32)
    params_d['conv_offset_mask']['bias'] = jnp.asarray(bias)

    sd = flax_to_torch({'m_dyn_agg': params_d})
    sd_f = dcn_to_flow_state_dict(sd, deform_groups=DG)
    tree = torch_to_flax(sd_f)
    vars_f = {'params': jax.tree_util.tree_map(
        jnp.asarray, tree['params']['m_flow_agg'])}

    out_d = np.asarray(net_d.apply({'params': params_d}, x, feat, po))
    out_f = np.asarray(net_f.apply(vars_f, x, feat, po))

    diff = np.abs(out_f - out_d)[0]  # (h, w, cout)
    interior = diff[1:-1, 1:-1]
    border = np.concatenate([diff[0].ravel(), diff[-1].ravel(),
                             diff[:, 0].ravel(), diff[:, -1].ravel()])
    # interior: exact (fp32 sampling + conv noise only)
    assert interior.max() < 1e-4, interior.max()
    # border: genuinely different — off-grid taps see 0 vs the
    # flow-displaced sample. If this starts passing at interior
    # tolerance, the ops' padding semantics changed: re-derive the
    # converter's exactness claim.
    assert border.max() > 1e-2, border.max()


def test_warm_start_close_on_smooth_flow():
    """Tap-shifted copies of a smooth flow: conversion is exact only to
    O(grad flow); it must still track the DCN model far better than an
    untrained flow model does."""
    from mrefsr_tpu.ops import tensor_shift
    rng = np.random.RandomState(1)
    net_d, net_f = _nets()
    b, t, h, w = 1, 2, 6, 8
    x = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    pre_offset, ref_feat = {}, {}
    for level, s, c in (('relu3_1', 1, 256), ('relu2_1', 2, 128),
                        ('relu1_1', 4, 64)):
        hs, ws = h * s, w * s
        po = np.empty((b, t, hs, ws, K2, 2), np.float32)
        for bi in range(b):
            for ti in range(t):
                gy = np.linspace(-1.5, 1.5, hs, dtype=np.float32)
                gx = np.linspace(-1.0, 1.0, ws, dtype=np.float32)
                flow = np.stack(
                    [np.broadcast_to(gx[None, :], (hs, ws)),
                     np.broadcast_to(gy[:, None], (hs, ws))], -1)
                shifts = [np.asarray(tensor_shift(
                    jnp.asarray(flow), (i * s, j * s)))
                    for i in range(3) for j in range(3)]
                po[bi, ti] = np.stack(shifts, axis=2)
        pre_offset[level] = jnp.asarray(po)
        ref_feat[level] = jnp.asarray(
            rng.randn(b, t, hs, ws, c), jnp.float32)

    vars_d = net_d.init(jax.random.PRNGKey(0), x, pre_offset, ref_feat)
    vars_d = {'params': _perturb_dcn_params(
        jax.device_get(vars_d)['params'], rng)}
    out_d = np.asarray(net_d.apply(vars_d, x, pre_offset, ref_feat))
    out_f = np.asarray(net_f.apply(_convert_vars(vars_d), x,
                                   pre_offset, ref_feat))
    fresh = net_f.init(jax.random.PRNGKey(7), x, pre_offset, ref_feat)
    out_fresh = np.asarray(net_f.apply(jax.device_get(fresh), x,
                                       pre_offset, ref_feat))
    err_conv = np.abs(out_f - out_d).mean()
    err_fresh = np.abs(out_fresh - out_d).mean()
    scale = np.abs(out_d - out_d.mean()).mean()
    assert err_conv < 0.25 * scale, (err_conv, scale)
    assert err_conv < 0.5 * err_fresh, (err_conv, err_fresh)


def test_mapping_layout():
    """Key-level contract: flow rows <- center-tap offset rows, gate
    rows zero, conv scaled by 2*sigmoid(mask bias), passthrough of
    everything else, no _dyn_agg key survives."""
    rng = np.random.RandomState(2)
    cin, cout = 8, 8
    cg = cin // DG
    sd = {
        'dyn_agg_restore.small_dyn_agg.conv_offset_mask.weight':
            rng.randn(3 * DG * K2, cin, 3, 3).astype(np.float32),
        'dyn_agg_restore.small_dyn_agg.conv_offset_mask.bias':
            rng.randn(3 * DG * K2).astype(np.float32),
        'dyn_agg_restore.small_dyn_agg.weight':
            rng.randn(cout, cin, 3, 3).astype(np.float32),
        'dyn_agg_restore.small_dyn_agg.bias':
            rng.randn(cout).astype(np.float32),
        'content_extractor.conv_first.weight':
            rng.randn(4, 3, 3, 3).astype(np.float32),
    }
    out = dcn_to_flow_state_dict(sd, deform_groups=DG)
    assert not any('_dyn_agg' in k for k in out)
    base = 'dyn_agg_restore.small_flow_agg'
    w_fg = out[f'{base}.conv_flow_gate.weight']
    b_fg = out[f'{base}.conv_flow_gate.bias']
    w_om = sd['dyn_agg_restore.small_dyn_agg.conv_offset_mask.weight']
    b_om = sd['dyn_agg_restore.small_dyn_agg.conv_offset_mask.bias']
    assert w_fg.shape == (3 * DG, cin, 3, 3)
    for g in range(DG):
        for j in range(2):
            src = g * 2 * K2 + 2 * 4 + j
            np.testing.assert_array_equal(w_fg[2 * g + j], w_om[src])
            assert b_fg[2 * g + j] == b_om[src]
    np.testing.assert_array_equal(w_fg[2 * DG:], 0)
    np.testing.assert_array_equal(b_fg[2 * DG:], 0)

    w_cv = out[f'{base}.conv_after_warp.weight']
    mask_bias = b_om[2 * DG * K2:].reshape(DG, K2)
    for g in range(DG):
        for ky in range(3):
            for kx in range(3):
                s = 2.0 / (1.0 + np.exp(-mask_bias[g, ky * 3 + kx]))
                np.testing.assert_allclose(
                    w_cv[:, g * cg:(g + 1) * cg, ky, kx],
                    sd['dyn_agg_restore.small_dyn_agg.weight'][
                        :, g * cg:(g + 1) * cg, ky, kx] * s,
                    rtol=1e-6)
    np.testing.assert_array_equal(
        out['content_extractor.conv_first.weight'],
        sd['content_extractor.conv_first.weight'])


def test_cli_script(tmp_path):
    import subprocess
    import sys
    import torch
    rng = np.random.RandomState(3)
    sd = {'dyn_agg_restore.large_dyn_agg.conv_offset_mask.weight':
          torch.randn(3 * 8 * K2, 16, 3, 3),
          'dyn_agg_restore.large_dyn_agg.conv_offset_mask.bias':
          torch.randn(3 * 8 * K2),
          'dyn_agg_restore.large_dyn_agg.weight':
          torch.randn(16, 16, 3, 3),
          'dyn_agg_restore.large_dyn_agg.bias': torch.randn(16),
          'content_extractor.conv_first.weight': torch.randn(4, 3, 3, 3)}
    torch.save({'params': sd, 'iter': 42}, tmp_path / 'dcn.pth')
    proc = subprocess.run(
        [sys.executable,
         'scripts/model_conversion/convert_dcn_to_flow.py',
         '--input', str(tmp_path / 'dcn.pth'),
         '--output', str(tmp_path / 'flow.pth')],
        cwd='/root/repo', capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    ckpt = torch.load(tmp_path / 'flow.pth', weights_only=True)
    assert ckpt['iter'] == 42  # metadata keys pass through
    out = ckpt['params']
    assert 'dyn_agg_restore.large_flow_agg.conv_after_warp.weight' in out
    assert not any('_dyn_agg' in k for k in out)
