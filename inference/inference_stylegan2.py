"""StyleGAN2 sampling (reference inference/inference_stylegan2.py):
fixed-seed sample grids with optional truncation.
"""
import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import os

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from mrefsr_tpu.archs.stylegan2_arch import (StyleGAN2Generator,
                                             stylegan2_rename)
from mrefsr_tpu.convert import load_torch_state_dict, torch_to_flax
from mrefsr_tpu.utils import set_random_seed, tensor2img


def generate(args, model, variables, mean_latent, rng):
    for i in range(args.pics):
        rng, k1, k2 = jax.random.split(rng, 3)
        sample_z = jax.random.normal(k1, (args.sample, args.latent))
        sample, _ = model.apply(
            variables, [sample_z], truncation=args.truncation,
            randomize_noise=args.randomize_noise,
            truncation_latent=mean_latent, rngs={'noise': k2})
        grid = tensor2img(sample, min_max=(-1, 1))
        cv2.imwrite(f'samples/{str(i).zfill(6)}.png', grid)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--size', type=int, default=1024)
    parser.add_argument('--sample', type=int, default=16)
    parser.add_argument('--pics', type=int, default=4)
    parser.add_argument('--truncation', type=float, default=0.7)
    parser.add_argument('--truncation_mean', type=int, default=4096)
    parser.add_argument('--randomize_noise', action='store_true')
    parser.add_argument('--seed', type=int, default=2020)
    parser.add_argument(
        '--ckpt', type=str,
        default='experiments/pretrained_models/'
                'stylegan2_ffhq_config_f_1024_official-b09c3668.pth')
    parser.add_argument('--channel_multiplier', type=int, default=2)
    args = parser.parse_args()
    args.latent = 512

    set_random_seed(args.seed)
    model = StyleGAN2Generator(
        out_size=args.size, num_style_feat=args.latent, num_mlp=8,
        channel_multiplier=args.channel_multiplier)
    sd = load_torch_state_dict(args.ckpt, param_key='params_ema')
    variables = torch_to_flax(sd, rename=stylegan2_rename)
    p = variables['params']
    if 'constant_input' in p:
        p['constant_input']['const'] = np.transpose(
            p['constant_input']['const'], (0, 2, 3, 1))
    for k in list(p):
        if k.startswith('noises.noise'):
            p[k] = np.transpose(p[k], (0, 2, 3, 1))
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    rng = jax.random.PRNGKey(args.seed)
    if args.truncation < 1:
        rng, k = jax.random.split(rng)
        latent_in = jax.random.normal(k, (args.truncation_mean,
                                          args.latent))
        # style MLP ONLY (reference g_ema.mean_latent): synthesizing
        # 4096 full-resolution images just to average latents OOMs
        from mrefsr_tpu.archs.stylegan2_arch import StyleMLP
        mlp_params = {k2: v for k2, v in variables['params'].items()
                      if k2.startswith('style_mlp.')}
        w = StyleMLP(args.latent, 8).apply({'params': mlp_params},
                                           latent_in)
        mean_latent = w.mean(0, keepdims=True)
    else:
        mean_latent = None

    os.makedirs('samples', exist_ok=True)
    generate(args, model, variables, mean_latent, rng)


if __name__ == '__main__':
    main()
