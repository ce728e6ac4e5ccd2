"""Key-layout round-trip tests for the EDVR / DUF checkpoint converters
(scripts/model_conversion/convert_models.py vs reference
scripts/model_conversion/convert_models.py:4-357).

Strategy: build the real reference arch (torch, DCN-stubbed), derive the
old-official key layout by transcribing the reference's crt->ori rules
verbatim, then check our ori->crt converter reproduces the arch's full
state-dict key set and values exactly.
"""
import importlib.util
import sys

import pytest
import torch

sys.path.insert(0, '/root/repo/tests/test_archs')
from test_arch_parity import _stub_basicsr  # noqa: E402


@pytest.fixture(scope='module')
def loader():
    return _stub_basicsr()


@pytest.fixture(scope='module')
def converters():
    spec = importlib.util.spec_from_file_location(
        'convert_models_script',
        '/root/repo/scripts/model_conversion/convert_models.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _edvr_ori_key(crt_k):
    """BasicSR EDVR key -> old official key: a verbatim transcription of
    reference convert_models.py:16-93 (convert_edvr's rule chain)."""
    if 'predeblur.stride_conv_hr1' in crt_k:
        return crt_k.replace('predeblur.stride_conv_hr1',
                             'pre_deblur.conv_first_2')
    if 'predeblur.stride_conv_hr2' in crt_k:
        return crt_k.replace('predeblur.stride_conv_hr2',
                             'pre_deblur.conv_first_3')
    if 'predeblur.conv_first' in crt_k:
        return crt_k.replace('predeblur.conv_first',
                             'pre_deblur.conv_first_1')
    if 'predeblur.stride_conv_l2' in crt_k:
        return crt_k.replace('predeblur.stride_conv_l2',
                             'pre_deblur.deblur_L2_conv')
    if 'predeblur.stride_conv_l3' in crt_k:
        return crt_k.replace('predeblur.stride_conv_l3',
                             'pre_deblur.deblur_L3_conv')
    if 'predeblur.resblock_l3' in crt_k:
        return crt_k.replace('predeblur.resblock_l3',
                             'pre_deblur.RB_L3_1')
    if 'predeblur.resblock_l2' in crt_k:
        return crt_k.replace('predeblur.resblock_l', 'pre_deblur.RB_L')
    if 'predeblur.resblock_l1' in crt_k:
        a, b, c, d, e = crt_k.split('.')
        return f'pre_deblur.RB_L1_{int(c) + 1}.{d}.{e}'
    if 'conv_l2' in crt_k:
        return crt_k.replace('conv_l2_', 'fea_L2_conv')
    if 'conv_l3' in crt_k:
        return crt_k.replace('conv_l3_', 'fea_L3_conv')
    if 'pcd_align.dcn_pack' in crt_k:
        idx = crt_k.split('.l')[1].split('.')[0]
        name = crt_k.split('.l')[1].split('.')[1]
        if 'conv_offset' in crt_k:
            name = name.replace('conv_offset', 'conv_offset_mask')
            weight_bias = crt_k.split('.l')[1].split('.')[2]
            return f'pcd_align.L{idx}_dcnpack.{name}.{weight_bias}'
        return f'pcd_align.L{idx}_dcnpack.{name}'
    if 'pcd_align.offset_conv' in crt_k:
        _, b, c, d = crt_k.split('.')
        idx = b.split('conv')[1]
        level = c.split('l')[1]
        return f'pcd_align.L{level}_offset_conv{idx}.{d}'
    if 'pcd_align.feat_conv' in crt_k:
        a, b, c, d = crt_k.split('.')
        level = c.split('l')[1]
        return f'pcd_align.L{level}_fea_conv.{d}'
    if 'pcd_align.cas_dcnpack' in crt_k:
        return crt_k.replace('conv_offset', 'conv_offset_mask')
    if ('conv_first' in crt_k or 'feature_extraction' in crt_k
            or 'pcd_align.cas_offset' in crt_k or 'upconv' in crt_k
            or 'conv_last' in crt_k or 'conv_1x1' in crt_k):
        return crt_k
    if 'temporal_attn1' in crt_k:
        return crt_k.replace('fusion.temporal_attn1', 'tsa_fusion.tAtt_2')
    if 'temporal_attn2' in crt_k:
        return crt_k.replace('fusion.temporal_attn2', 'tsa_fusion.tAtt_1')
    if 'fusion.feat_fusion' in crt_k:
        return crt_k.replace('fusion.feat_fusion', 'tsa_fusion.fea_fusion')
    if 'fusion.spatial_attn_add' in crt_k:
        return crt_k.replace('fusion.spatial_attn_add',
                             'tsa_fusion.sAtt_add_')
    if 'fusion.spatial_attn_l' in crt_k:
        return crt_k.replace('fusion.spatial_attn_l', 'tsa_fusion.sAtt_L')
    if 'fusion.spatial_attn' in crt_k:
        return crt_k.replace('fusion.spatial_attn', 'tsa_fusion.sAtt_')
    if 'reconstruction' in crt_k:
        return crt_k.replace('reconstruction', 'recon_trunk')
    if 'conv_hr' in crt_k:
        return crt_k.replace('conv_hr', 'HRconv')
    if 'fusion' in crt_k:
        return crt_k.replace('fusion', 'tsa_fusion')
    return None


def _duf_ori_key_16(crt_k):
    """BasicSR DUF (16L) key -> old official key: transcription of
    reference convert_models.py:274-338."""
    if 'conv3d1' in crt_k:
        return crt_k.replace('conv3d1', 'conv3d_1')
    if 'conv3d2' in crt_k:
        return crt_k.replace('conv3d2', 'conv3d_2')
    pairs = []
    for block in range(3):
        base = f'dense_block1.dense_blocks.{block}'
        pairs += [(f'{base}.0', f'dense_block_1.bn3d_{2 * block + 1}'),
                  (f'{base}.2', f'dense_block_1.conv3d_{2 * block + 1}'),
                  (f'{base}.3', f'dense_block_1.bn3d_{2 * block + 2}'),
                  (f'{base}.5', f'dense_block_1.conv3d_{2 * block + 2}')]
    for j in (1, 2, 3):
        base = f'dense_block2.temporal_reduce{j}'
        pairs += [(f'{base}.0', f'dense_block_2.bn3d_{2 * j - 1}'),
                  (f'{base}.2', f'dense_block_2.conv3d_{2 * j - 1}'),
                  (f'{base}.3', f'dense_block_2.bn3d_{2 * j}'),
                  (f'{base}.5', f'dense_block_2.conv3d_{2 * j}')]
    for crt, ori in pairs:
        if crt_k.startswith(crt + '.'):
            return crt_k.replace(crt, ori)
    if 'bn3d2' in crt_k:
        return crt_k.replace('bn3d2', 'bn3d_2')
    return crt_k  # identity keys (conv3d_r*, conv3d_f*)


def test_edvr_converter_roundtrip(loader, converters, tmp_path):
    ref = loader('basicsr.archs.edvr_arch', 'basicsr/archs/edvr_arch.py')
    torch.manual_seed(0)
    tm = ref.EDVR(num_feat=8, num_frame=5, deformable_groups=2,
                  num_extract_block=1, num_reconstruct_block=1,
                  with_predeblur=True, with_tsa=True, hr_in=True)
    crt = tm.state_dict()
    ori = {}
    for k, v in crt.items():
        ori_k = _edvr_ori_key(k)
        assert ori_k is not None, f'reference rules do not cover {k}'
        assert ori_k not in ori, f'collision at {ori_k}'
        ori[ori_k] = v
    torch.save(ori, tmp_path / 'edvr_old.pth')

    converters.convert_edvr(str(tmp_path / 'edvr_old.pth'),
                            str(tmp_path / 'edvr_new.pth'))
    out = torch.load(tmp_path / 'edvr_new.pth', weights_only=True)['params']
    assert set(out) == set(crt)
    for k in crt:
        assert torch.equal(out[k], crt[k]), k


def test_edvr_converter_roundtrip_no_tsa(loader, converters, tmp_path):
    """The woTSA model exercises the bare fusion.* passthrough rule
    (reference convert_models.py:88-90)."""
    ref = loader('basicsr.archs.edvr_arch', 'basicsr/archs/edvr_arch.py')
    torch.manual_seed(1)
    tm = ref.EDVR(num_feat=8, num_frame=3, deformable_groups=2,
                  num_extract_block=1, num_reconstruct_block=1,
                  with_tsa=False)
    crt = tm.state_dict()
    ori = {_edvr_ori_key(k): v for k, v in crt.items()}
    torch.save(ori, tmp_path / 'edvr_old.pth')
    converters.convert_edvr(str(tmp_path / 'edvr_old.pth'),
                            str(tmp_path / 'edvr_new.pth'))
    out = torch.load(tmp_path / 'edvr_new.pth', weights_only=True)['params']
    assert set(out) == set(crt)
    for k in crt:
        assert torch.equal(out[k], crt[k]), k


def test_duf16_converter_roundtrip(loader, converters, tmp_path):
    ref = loader('basicsr.archs.duf_arch', 'basicsr/archs/duf_arch.py')
    torch.manual_seed(2)
    scale = 2
    tm = ref.DUF(scale=scale, num_layer=16, adapt_official_weights=True)
    crt = tm.state_dict()
    ori = {}
    for k, v in crt.items():
        ori_k = _duf_ori_key_16(k)
        assert ori_k not in ori, f'collision at {ori_k}'
        ori[ori_k] = v.clone()
    # invert the conv3d_r2 channel regroup the converter must perform
    # (reference convert_models.py:342-356: crt[:r2]=ori[0::3], ...)
    r2 = scale ** 2
    for name in ('conv3d_r2.weight', 'conv3d_r2.bias'):
        x = crt[name]
        y = torch.empty_like(x)
        y[0::3], y[1::3], y[2::3] = x[:r2], x[r2:2 * r2], x[2 * r2:]
        ori[name] = y
    torch.save(ori, tmp_path / 'duf_old.pth')

    converters.convert_duf(str(tmp_path / 'duf_old.pth'),
                           str(tmp_path / 'duf_new.pth'),
                           scale=scale, num_layer=16)
    out = torch.load(tmp_path / 'duf_new.pth', weights_only=True)['params']
    assert set(out) == set(crt)
    for k in crt:
        assert torch.equal(out[k], crt[k]), k


def test_duf_flat_dense_block_scheme(converters):
    """28/52-layer official DUFs store dense blocks as one flat
    Sequential (reference convert_models.py:215-224):
    dense_blocks.{i*6+pos} -> dense_blocks.{i}.{pos}."""
    key = converters._duf_key('dense_block_1.dense_blocks.13.weight', 52)
    assert key == 'dense_block1.dense_blocks.2.1.weight'
    key = converters._duf_key('dense_block_1.dense_blocks.0.weight', 28)
    assert key == 'dense_block1.dense_blocks.0.0.weight'
    key = converters._duf_key('dense_block_1.dense_blocks.11.bias', 52)
    assert key == 'dense_block1.dense_blocks.1.5.bias'
