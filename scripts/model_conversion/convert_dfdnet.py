"""Convert the official DFDNet weights into the reference key scheme
(reference scripts/model_conversion/convert_dfdnet.py). The resulting
.pth imports into this framework via torch_to_flax."""
import argparse
import os.path as osp
import sys

import torch

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.archs.vgg_arch import NAMES  # noqa: E402

PART_MAP = {'left_eye': 'le', 'right_eye': 're', 'mouth': 'mo',
            'nose': 'no'}


def convert_net(ori_net, crt_keys_and_shapes):
    """crt_keys_and_shapes: {reference_layout_key: shape}."""
    out = {}
    for crt_k, shape in crt_keys_and_shapes.items():
        if 'vgg_extractor' in crt_k:
            if 'mean' in crt_k:
                ori_k = 'VggExtract.RGB_mean'
            elif 'std' in crt_k:
                ori_k = 'VggExtract.RGB_std'
            else:
                idx = NAMES['vgg19'].index(crt_k.split('.')[2])
                leaf = 'weight' if 'weight' in crt_k else 'bias'
                ori_k = f'VggExtract.model.features.{idx}.{leaf}'
        elif 'attn_blocks' in crt_k:
            ori_k = crt_k
            for part, short in PART_MAP.items():
                if part in crt_k:
                    ori_k = crt_k.replace(f'attn_blocks.{part}', short)
                    break
        elif 'multi_scale_dilation' in crt_k:
            if 'conv_blocks' in crt_k:
                _, _, c, d, e = crt_k.split('.')
                ori_k = f'MSDilate.conv{int(c) + 1}.{d}.{e}'
            else:
                ori_k = crt_k.replace('multi_scale_dilation.conv_fusion',
                                      'MSDilate.convi')
        elif crt_k.startswith('upsample'):
            ori_k = crt_k.replace('upsample', 'up')
            if 'scale_block' in crt_k:
                ori_k = ori_k.replace('scale_block', 'ScaleModel1')
            elif 'shift_block' in crt_k:
                ori_k = ori_k.replace('shift_block', 'ShiftModel1')
            elif 'upsample4' in crt_k and 'body' in crt_k:
                ori_k = ori_k.replace('body', 'Model')
        else:
            print('unprocessed key: ', crt_k)
            continue
        if tuple(ori_net[ori_k].shape) != tuple(shape):
            raise ValueError(f'Wrong tensor size for {crt_k}: '
                             f'{shape} vs {ori_net[ori_k].shape}')
        out[crt_k] = ori_net[ori_k]
    return out


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--ori', type=str, required=True,
                        help='official DFDNet checkpoint')
    parser.add_argument('--layout', type=str, required=True,
                        help='reference-layout checkpoint giving the '
                             'target key set')
    parser.add_argument('--save', type=str, required=True)
    args = parser.parse_args()
    ori = torch.load(args.ori, map_location='cpu')
    layout = torch.load(args.layout, map_location='cpu')
    sd = layout.get('params', layout)
    shapes = {k: v.shape for k, v in sd.items()}
    torch.save({'params': convert_net(ori, shapes)}, args.save)
    print('saved', args.save)
