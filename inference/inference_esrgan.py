"""ESRGAN single-image inference
(reference inference/inference_esrgan.py:11-53), jitted RRDBNet forward.
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

from mrefsr_tpu.archs.rrdbnet_arch import RRDBNet
from mrefsr_tpu.convert import load_torch_state_dict, torch_to_flax


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        '--model_path', type=str,
        default='experiments/pretrained_models/ESRGAN/'
                'ESRGAN_SRx4_DF2KOST_official-ff704c30.pth')
    parser.add_argument('--input', type=str, default='datasets/Set14/LRbicx4',
                        help='input test image folder')
    parser.add_argument('--output', type=str, default='results/ESRGAN',
                        help='output folder')
    args = parser.parse_args()

    model = RRDBNet(num_in_ch=3, num_out_ch=3, num_feat=64, num_block=23,
                    num_grow_ch=32)
    variables = torch_to_flax(load_torch_state_dict(args.model_path))
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    forward = jax.jit(lambda img: model.apply(variables, img))

    os.makedirs(args.output, exist_ok=True)
    for idx, path in enumerate(
            sorted(glob.glob(os.path.join(args.input, '*')))):
        imgname = os.path.splitext(os.path.basename(path))[0]
        print('Testing', idx, imgname)
        img = cv2.imread(path, cv2.IMREAD_COLOR).astype(np.float32) / 255.
        img = jnp.asarray(img[None, :, :, ::-1])  # BGR->RGB, NHWC
        try:
            output = forward(img)
        except Exception as error:  # noqa: BLE001
            print('Error', error, imgname)
        else:
            output = np.asarray(output[0]).clip(0, 1)[:, :, ::-1]
            output = (output * 255.0).round().astype(np.uint8)
            cv2.imwrite(os.path.join(args.output,
                                     f'{imgname}_ESRGAN.png'), output)


if __name__ == '__main__':
    main()
