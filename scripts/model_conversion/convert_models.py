"""Convert official third-party checkpoints into the reference
(BasicSR-layout) key scheme, which this framework then imports directly
through ``mrefsr_tpu.convert.torch_to_flax``
(reference scripts/model_conversion/convert_models.py).

Each converter takes the official .pth, remaps keys onto our arch's
naming, and writes a ``{'params': state_dict}`` file. Usage:
    python scripts/model_conversion/convert_models.py esrgan \\
        --ori old_arch.pth --save ESRGAN_x4_official.pth
"""
import argparse
import os.path as osp
import sys

import torch

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def _load(path):
    net = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(net, dict) and 'params' in net:
        net = net['params']
    if isinstance(net, dict) and 'state_dict' in net:
        net = net['state_dict']
    return net


def convert_esrgan(ori_path, save_path):
    """Old-arch ESRGAN (RRDB_ESRGAN_x4.pth) -> RRDBNet keys
    (reference convert_models.py:174-199)."""
    ori_net = _load(ori_path)
    out = {}
    for ori_k, v in ori_net.items():
        crt_k = (ori_k.replace('RRDB_trunk', 'body')
                 .replace('RDB', 'rdb')
                 .replace('trunk_conv', 'conv_body')
                 .replace('upconv', 'conv_up')
                 .replace('HRconv', 'conv_hr'))
        # inside an RRDB the dense blocks live under 'rdb<i>'
        out[crt_k] = v
    torch.save({'params': out}, save_path)
    print(f'saved {save_path} ({len(out)} tensors)')


def convert_edsr(ori_path, save_path, num_block=32):
    """Official EDSR-PyTorch -> EDSR keys
    (reference convert_models.py:102-135).

    head.0 -> conv_first; body.i.body.{0,2} -> body.i.conv{1,2};
    body.N -> conv_after_body; tail.0.{0,2} -> upsample.{0,2};
    tail.1 -> conv_last.
    """
    ori_net = _load(ori_path)
    out = {}
    for ori_k, v in ori_net.items():
        parts = ori_k.split('.')
        if ori_k.startswith('head.0'):
            crt_k = ori_k.replace('head.0', 'conv_first')
        elif ori_k.startswith(f'body.{num_block}.'):
            crt_k = ori_k.replace(f'body.{num_block}',
                                  'conv_after_body')
        elif ori_k.startswith('body.'):
            crt_k = (f'body.{parts[1]}.'
                     + {'0': 'conv1', '2': 'conv2'}[parts[3]]
                     + f'.{parts[4]}')
        elif ori_k.startswith('tail.0.0'):
            crt_k = ori_k.replace('tail.0.0', 'upsample.0')
        elif ori_k.startswith('tail.0.2'):
            crt_k = ori_k.replace('tail.0.2', 'upsample.2')
        elif ori_k.startswith('tail.1'):
            crt_k = ori_k.replace('tail.1', 'conv_last')
        else:
            print('unprocessed key', ori_k)
            continue
        out[crt_k] = v
    torch.save({'params': out}, save_path)
    print(f'saved {save_path} ({len(out)} tensors)')


def convert_rcan(ori_path, save_path, num_group=10, num_block=20):
    """Official RCAN -> RCAN keys (reference convert_models.py:138-171).

    body.g.body.b.body.{0,2} -> body.g.residual_group.b.rcab.{0,2};
    body.g.body.b.conv_du.{0,2} -> ...rcab.3.attention.{1,3};
    body.g.body.N -> body.g.conv; body.G -> conv_after_body.
    """
    ori_net = _load(ori_path)
    out = {}
    for ori_k, v in ori_net.items():
        parts = ori_k.split('.')
        if ori_k.startswith('head.0'):
            crt_k = ori_k.replace('head.0', 'conv_first')
        elif ori_k.startswith(f'body.{num_group}.'):
            crt_k = ori_k.replace(f'body.{num_group}', 'conv_after_body')
        elif ori_k.startswith('tail.0.0'):
            crt_k = ori_k.replace('tail.0.0', 'upsample.0')
        elif ori_k.startswith('tail.0.2'):
            crt_k = ori_k.replace('tail.0.2', 'upsample.2')
        elif ori_k.startswith('tail.1'):
            crt_k = ori_k.replace('tail.1', 'conv_last')
        elif ori_k.startswith('body.') and 'conv_du' in ori_k:
            g, b = parts[1], parts[3]
            du_idx = int(parts[5])
            crt_k = (f'body.{g}.residual_group.{b}.rcab.3.'
                     f'attention.{du_idx + 1}.{parts[6]}')
        elif ori_k.startswith('body.') and parts[4] == 'body':
            g, b = parts[1], parts[3]
            crt_k = (f'body.{g}.residual_group.{b}.rcab.'
                     f'{parts[5]}.{parts[6]}')
        elif ori_k.startswith('body.') and parts[2] == 'body' \
                and parts[3] == str(num_block):
            g = parts[1]
            crt_k = f'body.{g}.conv.{parts[4]}'
        else:
            print('unprocessed key', ori_k)
            continue
        out[crt_k] = v
    torch.save({'params': out}, save_path)
    print(f'saved {save_path} ({len(out)} tensors)')


CONVERTERS = {'esrgan': convert_esrgan, 'edsr': convert_edsr,
              'rcan': convert_rcan}

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('model', choices=sorted(CONVERTERS))
    parser.add_argument('--ori', type=str, required=True,
                        help='official checkpoint path')
    parser.add_argument('--save', type=str, required=True)
    args = parser.parse_args()
    CONVERTERS[args.model](args.ori, args.save)
