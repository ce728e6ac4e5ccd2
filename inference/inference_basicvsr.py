"""BasicVSR video inference (reference inference/inference_basicvsr.py):
folder or video input (via ffmpeg), chunked by --interval frames.
"""
import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import glob
import os
import shutil

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from mrefsr_tpu.archs.basicvsr_arch import BasicVSR
from mrefsr_tpu.convert import load_torch_state_dict, torch_to_flax
from mrefsr_tpu.data.data_util import read_img_seq
from mrefsr_tpu.utils import tensor2img


def inference(imgs, imgnames, model, variables, save_path,
              suffix='BasicVSR'):
    outputs = model.apply(variables, jnp.asarray(imgs)[None])
    for output, imgname in zip(np.asarray(outputs[0]), imgnames):
        cv2.imwrite(os.path.join(save_path, f'{imgname}_{suffix}.png'),
                    tensor2img(output))


def main(model_cls=BasicVSR, default_kwargs=None, suffix='BasicVSR'):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        '--model_path', type=str,
        default='experiments/pretrained_models/BasicVSR_REDS4.pth')
    parser.add_argument('--input_path', type=str,
                        default='datasets/REDS4/sharp_bicubic/000')
    parser.add_argument('--save_path', type=str, default='results/BasicVSR')
    parser.add_argument('--interval', type=int, default=15)
    args = parser.parse_args()

    model = model_cls(**(default_kwargs
                         or dict(num_feat=64, num_block=30)))
    sd = load_torch_state_dict(args.model_path, param_key='params')
    variables = jax.tree_util.tree_map(jnp.asarray, torch_to_flax(sd))

    os.makedirs(args.save_path, exist_ok=True)
    input_path = args.input_path
    use_ffmpeg = False
    if not os.path.isdir(input_path):
        use_ffmpeg = True
        video_name = os.path.splitext(os.path.split(
            args.input_path)[-1])[0]
        input_path = os.path.join('./BasicVSR_tmp', video_name)
        os.makedirs(input_path, exist_ok=True)
        os.system(f'ffmpeg -i {args.input_path} -qscale:v 1 -qmin 1 '
                  f'-qmax 1 -vsync 0 {input_path}/frame%08d.png')

    imgs_list = sorted(glob.glob(os.path.join(input_path, '*')))
    num_imgs = len(imgs_list)
    if num_imgs <= args.interval:
        imgs, imgnames = read_img_seq(imgs_list, return_imgname=True)
        inference(imgs, imgnames, model, variables, args.save_path,
                  suffix)
    else:
        for idx in range(0, num_imgs, args.interval):
            interval = min(args.interval, num_imgs - idx)
            imgs, imgnames = read_img_seq(imgs_list[idx:idx + interval],
                                          return_imgname=True)
            inference(imgs, imgnames, model, variables, args.save_path,
                      suffix)

    if use_ffmpeg:
        shutil.rmtree(input_path)


if __name__ == '__main__':
    main()
