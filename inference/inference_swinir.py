"""SwinIR inference for all tasks
(reference inference/inference_swinir.py:13-198): reflect-pads input to
a window_size multiple, crops the output back.
"""
import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import glob
import os

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from mrefsr_tpu.archs.swinir_arch import SwinIR
from mrefsr_tpu.convert import load_torch_state_dict, torch_to_flax


def define_model(args):
    """(reference inference_swinir.py:79-190)"""
    common = dict(img_range=1., mlp_ratio=2, resi_connection='1conv')
    if args.task == 'classical_sr':
        model = SwinIR(upscale=args.scale, in_chans=3,
                       img_size=args.patch_size, window_size=8,
                       depths=(6,) * 6, embed_dim=180, num_heads=(6,) * 6,
                       upsampler='pixelshuffle', **common)
    elif args.task == 'lightweight_sr':
        model = SwinIR(upscale=args.scale, in_chans=3, img_size=64,
                       window_size=8, depths=(6,) * 4, embed_dim=60,
                       num_heads=(6,) * 4, upsampler='pixelshuffledirect',
                       **common)
    elif args.task == 'real_sr':
        if not args.large_model:
            model = SwinIR(upscale=4, in_chans=3, img_size=64,
                           window_size=8, depths=(6,) * 6, embed_dim=180,
                           num_heads=(6,) * 6, upsampler='nearest+conv',
                           **common)
        else:
            model = SwinIR(upscale=4, in_chans=3, img_size=64,
                           window_size=8, depths=(6,) * 9, embed_dim=248,
                           num_heads=(8,) * 9, upsampler='nearest+conv',
                           img_range=1., mlp_ratio=2,
                           resi_connection='3conv')
    elif args.task == 'gray_dn':
        model = SwinIR(upscale=1, in_chans=1, img_size=128, window_size=8,
                       depths=(6,) * 6, embed_dim=180, num_heads=(6,) * 6,
                       upsampler='', **common)
    elif args.task == 'color_dn':
        model = SwinIR(upscale=1, in_chans=3, img_size=128, window_size=8,
                       depths=(6,) * 6, embed_dim=180, num_heads=(6,) * 6,
                       upsampler='', **common)
    elif args.task == 'jpeg_car':
        model = SwinIR(upscale=1, in_chans=1, img_size=126, window_size=7,
                       img_range=255., depths=(6,) * 6, embed_dim=180,
                       num_heads=(6,) * 6, mlp_ratio=2, upsampler='',
                       resi_connection='1conv')
    else:
        raise ValueError(f'Unknown task {args.task}')

    from mrefsr_tpu.archs.swinir_arch import swinir_rename
    # single load: load_torch_state_dict's params_ema -> params fallback
    # covers both key layouts (convert.py)
    sd = load_torch_state_dict(args.model_path, param_key='params_ema')
    variables = torch_to_flax(sd, rename=swinir_rename)
    return model, jax.tree_util.tree_map(jnp.asarray, variables)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--input', type=str,
                        default='datasets/Set5/LRbicx4')
    parser.add_argument('--output', type=str,
                        default='results/SwinIR/Set5')
    parser.add_argument('--task', type=str, default='classical_sr',
                        help='classical_sr, lightweight_sr, real_sr, '
                             'gray_dn, color_dn, jpeg_car')
    parser.add_argument('--patch_size', type=int, default=64)
    parser.add_argument('--scale', type=int, default=4)
    parser.add_argument('--noise', type=int, default=15)
    parser.add_argument('--jpeg', type=int, default=40)
    parser.add_argument('--large_model', action='store_true')
    parser.add_argument(
        '--model_path', type=str,
        default='experiments/pretrained_models/SwinIR/'
                '001_classicalSR_DF2K_s64w8_SwinIR-M_x4.pth')
    args = parser.parse_args()

    os.makedirs(args.output, exist_ok=True)
    model, variables = define_model(args)
    window_size = 7 if args.task == 'jpeg_car' else 8

    for idx, path in enumerate(
            sorted(glob.glob(os.path.join(args.input, '*')))):
        imgname = os.path.splitext(os.path.basename(path))[0]
        print('Testing', idx, imgname)
        if args.task in ('gray_dn', 'jpeg_car'):
            # single-channel tasks: the nets are built with in_chans=1
            # (the reference script reads IMREAD_COLOR here and crashes)
            img = cv2.imread(path, cv2.IMREAD_GRAYSCALE).astype(
                np.float32) / 255.
            img = jnp.asarray(img[None, :, :, None])
        else:
            img = cv2.imread(path, cv2.IMREAD_COLOR).astype(
                np.float32) / 255.
            img = jnp.asarray(img[None, :, :, ::-1])

        h, w = img.shape[1:3]
        mod_pad_h = (window_size - h % window_size) % window_size
        mod_pad_w = (window_size - w % window_size) % window_size
        img = jnp.pad(img, ((0, 0), (0, mod_pad_h), (0, mod_pad_w),
                            (0, 0)), mode='reflect')
        output = model.apply(variables, img)
        output = output[:, :output.shape[1] - mod_pad_h * args.scale,
                        :output.shape[2] - mod_pad_w * args.scale]

        output = np.asarray(output[0]).clip(0, 1)
        if output.shape[-1] == 3:
            output = output[:, :, ::-1]
        output = (output * 255.0).round().astype(np.uint8)
        cv2.imwrite(os.path.join(args.output, f'{imgname}_SwinIR.png'),
                    output)


if __name__ == '__main__':
    main()
