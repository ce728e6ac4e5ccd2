"""RIDNet denoising inference (reference inference/inference_ridnet.py).
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

from mrefsr_tpu.archs.ridnet_arch import RIDNet
from mrefsr_tpu.convert import load_torch_state_dict, torch_to_flax

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--test_path', type=str,
                        default='datasets/denoise/RNI15')
    parser.add_argument('--noise_g', type=int, default=25)
    parser.add_argument(
        '--model_path', type=str,
        default='experiments/pretrained_models/RIDNet/RIDNet.pth')
    args = parser.parse_args()
    if args.test_path.endswith('/'):
        args.test_path = args.test_path[:-1]
    test_root = os.path.join(args.test_path, f'X{args.noise_g}')
    result_root = f'results/RIDNet/{os.path.basename(args.test_path)}'
    os.makedirs(result_root, exist_ok=True)

    net = RIDNet(3, 64, 3)
    sd = load_torch_state_dict(args.model_path, param_key=None)
    variables = jax.tree_util.tree_map(jnp.asarray, torch_to_flax(sd))

    img_list = sorted(glob.glob(os.path.join(test_root, '*.[jp][pn]g')))
    for idx, img_path in enumerate(img_list):
        img_name = os.path.basename(img_path).split('.')[0]
        print(f'{idx}: {img_name}')
        # the reference feeds [0,255]-range tensors (img2tensor float32
        # without /255, inference_ridnet.py:45)
        img = cv2.imread(img_path, cv2.IMREAD_COLOR).astype(np.float32)
        img = jnp.asarray(img[None, :, :, ::-1])
        output = net.apply(variables, img)
        output = np.asarray(output[0]).clip(0, 255)[:, :, ::-1]
        output = output.round().astype(np.uint8)
        cv2.imwrite(os.path.join(
            result_root, f'{img_name}_x{args.noise_g}_RIDNet.png'), output)
