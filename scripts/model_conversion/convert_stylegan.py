"""Convert official rosinality stylegan2-pytorch checkpoints to the
reference key scheme importable by this framework
(reference scripts/model_conversion/convert_stylegan.py)."""
import argparse
import torch


def convert_net_g(ori_net, crt_keys_and_shapes):
    """rosinality generator -> reference keys. ``crt_keys_and_shapes``
    is {reference_key: shape} (build one from a randomly initialized
    reference-layout checkpoint)."""
    out = {}
    for crt_k, shape in crt_keys_and_shapes.items():
        if 'style_mlp' in crt_k:
            ori_k = crt_k.replace('style_mlp', 'style')
        elif 'constant_input.weight' in crt_k:
            ori_k = crt_k.replace('constant_input.weight', 'input.input')
        elif 'style_conv1.modulated_conv' in crt_k:
            ori_k = crt_k.replace('style_conv1.modulated_conv',
                                  'conv1.conv')
        elif 'style_conv1' in crt_k:
            ori_k = (crt_k.replace('style_conv1', 'conv1.noise')
                     if tuple(shape) == (1,)
                     else crt_k.replace('style_conv1', 'conv1'))
        elif 'style_convs' in crt_k:
            ori_k = crt_k.replace('style_convs', 'convs').replace(
                'modulated_conv', 'conv')
            if tuple(shape) == (1,):
                ori_k = ori_k.replace('.weight', '.noise.weight')
        elif 'to_rgb1.modulated_conv' in crt_k:
            ori_k = crt_k.replace('to_rgb1.modulated_conv',
                                  'to_rgb1.conv')
        elif 'to_rgbs' in crt_k:
            ori_k = crt_k.replace('modulated_conv', 'conv')
        elif 'noises' in crt_k:
            ori_k = crt_k.replace('.noise', '.noise_')
        else:
            ori_k = crt_k
        if tuple(ori_net[ori_k].shape) != tuple(shape):
            raise ValueError(f'Wrong tensor size for {crt_k}: '
                             f'{shape} vs {ori_net[ori_k].shape}')
        out[crt_k] = ori_net[ori_k]
    return out


def convert_net_d(ori_net, crt_keys_and_shapes):
    out = {}
    for crt_k, shape in crt_keys_and_shapes.items():
        ori_k = crt_k.replace('conv_body', 'convs') \
            if 'conv_body' in crt_k else crt_k
        if tuple(ori_net[ori_k].shape) != tuple(shape):
            raise ValueError(f'Wrong tensor size for {crt_k}')
        out[crt_k] = ori_net[ori_k]
    return out


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--ori', type=str, required=True,
                        help='rosinality checkpoint (.pt with g_ema/d)')
    parser.add_argument('--layout', type=str, required=True,
                        help='a reference-layout checkpoint giving the '
                             'target key set (e.g. saved by this '
                             "framework's StyleGAN2Model)")
    parser.add_argument('--save', type=str, required=True)
    args = parser.parse_args()

    ori = torch.load(args.ori, map_location='cpu')
    layout = torch.load(args.layout, map_location='cpu')
    out = {}
    if 'g_ema' in ori:
        shapes = {k: v.shape for k, v in layout['params_ema'].items()}
        out['params_ema'] = convert_net_g(ori['g_ema'], shapes)
    if 'd' in ori and 'params' in layout:
        shapes = {k: v.shape for k, v in layout['params'].items()}
        out['params'] = convert_net_d(ori['d'], shapes)
    torch.save(out, args.save)
    print('saved', args.save)
