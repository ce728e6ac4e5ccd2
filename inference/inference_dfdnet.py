"""DFDNet face restoration inference
(reference inference/inference_dfdnet.py). Face detection/alignment via
facexlib when installed; otherwise pass pre-computed 68-point landmark
files (``--landmark_dir`` with one .npy per image).
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

from mrefsr_tpu.archs.dfdnet_arch import DFDNet, load_dfdnet_dict
from mrefsr_tpu.convert import load_torch_state_dict, torch_to_flax
from mrefsr_tpu.utils import imwrite, tensor2img

try:
    import dlib  # the reference's 68-landmark pipeline
except ImportError:
    dlib = None


def get_part_location(landmarks):
    """68-point landmarks -> xyxy boxes for the four parts
    (reference inference_dfdnet.py:20-48)."""
    map_left_eye = list(np.hstack((range(17, 22), range(36, 42))))
    map_right_eye = list(np.hstack((range(22, 27), range(42, 48))))
    map_nose = list(range(29, 36))
    map_mouth = list(range(48, 68))

    def part_box(points):
        mean = np.mean(points, axis=0)
        # minimum half-size 16 for EVERY part, like the reference
        # (inference_dfdnet.py:27-49) — not per-part sizes
        half_len = np.max((np.max(np.max(points, axis=0)
                                  - np.min(points, axis=0)) / 2, 16))
        box = np.hstack((mean - half_len + 1,
                         mean + half_len)).astype(int)
        return box[None]

    return [
        part_box(landmarks[map_left_eye]),
        part_box(landmarks[map_right_eye]),
        part_box(landmarks[map_nose]),
        part_box(landmarks[map_mouth]),
    ]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--upscale_factor', type=int, default=2)
    parser.add_argument(
        '--model_path', type=str,
        default='experiments/pretrained_models/DFDNet/'
                'DFDNet_official-d1fa5650.pth')
    parser.add_argument(
        '--dict_path', type=str,
        default='experiments/pretrained_models/DFDNet/'
                'DFDNet_dict_512-f79685f0.pth')
    parser.add_argument('--test_path', type=str,
                        default='datasets/TestWhole')
    parser.add_argument('--landmark_dir', type=str, default=None,
                        help='folder of per-image 68x2 landmark .npy '
                             'files (used when dlib is absent)')
    parser.add_argument(
        '--dlib_models', type=str,
        default='experiments/pretrained_models/dlib',
        help='folder with the reference dlib detector/predictor models')
    parser.add_argument('--save_path', type=str, default='results/DFDNet')
    args = parser.parse_args()

    model = DFDNet(num_feat=64)
    sd = load_torch_state_dict(args.model_path, param_key='params')
    variables = jax.tree_util.tree_map(jnp.asarray, torch_to_flax(sd))
    face_dict = load_dfdnet_dict(args.dict_path)

    detector = predictor = None
    if args.landmark_dir is None:
        if dlib is None:
            raise RuntimeError(
                'dlib is not installed; pass --landmark_dir with '
                'precomputed 68-point landmark .npy files (one '
                '<image>.npy of shape (68, 2) per input image)')
        # the reference's detector/predictor pair (inference_dfdnet.py)
        detector = dlib.cnn_face_detection_model_v1(os.path.join(
            args.dlib_models, 'mmod_human_face_detector-4cb19393.dat'))
        predictor = dlib.shape_predictor(os.path.join(
            args.dlib_models,
            'shape_predictor_68_face_landmarks-fbdc2cb8.dat'))

    # hoisted: part boxes are traced values, so ONE compiled graph
    # serves every face (static 512x512 shapes end to end)
    forward = jax.jit(model.apply)
    os.makedirs(args.save_path, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(args.test_path, '*'))):
        img_name = os.path.splitext(os.path.basename(path))[0]
        print('Processing', img_name)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        img = cv2.resize(img, (512, 512),
                         interpolation=cv2.INTER_LINEAR)

        if args.landmark_dir is not None:
            landmarks = np.load(
                os.path.join(args.landmark_dir, f'{img_name}.npy'))
        else:
            rgb = img[:, :, ::-1]
            dets = detector(rgb, 1)
            if len(dets) == 0:
                print('  no face detected, skip')
                continue
            shape = predictor(rgb, dets[0].rect)
            landmarks = np.array([[p.x, p.y] for p in shape.parts()])

        part_locations = get_part_location(np.asarray(landmarks))
        x = jnp.asarray(
            (img[:, :, ::-1].astype(np.float32) / 255.)[None] * 2 - 1)
        out = forward(variables, x, part_locations, face_dict)
        out = tensor2img(out, min_max=(-1, 1))
        imwrite(out, os.path.join(args.save_path,
                                  f'{img_name}_DFDNet.png'))


if __name__ == '__main__':
    main()
