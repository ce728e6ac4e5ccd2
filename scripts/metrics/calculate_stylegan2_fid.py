"""FID of a trained StyleGAN2 generator against dataset stats
(reference scripts/metrics/calculate_stylegan2_fid.py)."""
import argparse
import math
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mrefsr_tpu.archs.stylegan2_arch import (StyleGAN2Generator,  # noqa
                                             stylegan2_rename)
from mrefsr_tpu.convert import load_torch_state_dict, torch_to_flax  # noqa
from mrefsr_tpu.metrics.fid import (calculate_fid,  # noqa: E402
                                    extract_inception_features,
                                    load_patched_inception_v3)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('ckpt', type=str)
    parser.add_argument('fid_stats', type=str)
    parser.add_argument('--size', type=int, default=256)
    parser.add_argument('--channel_multiplier', type=int, default=2)
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--num_sample', type=int, default=50000)
    parser.add_argument('--truncation', type=float, default=1)
    parser.add_argument('--truncation_mean', type=int, default=4096)
    parser.add_argument('--inception_path', type=str, default=None)
    args = parser.parse_args()

    generator = StyleGAN2Generator(
        out_size=args.size, num_style_feat=512, num_mlp=8,
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

    _, _, feature_fn = load_patched_inception_v3(args.inception_path)
    total_batch = math.ceil(args.num_sample / args.batch_size)
    rng = jax.random.PRNGKey(0)

    truncation_latent = None
    if args.truncation < 1:
        # mean latent via the style MLP only (reference mean_latent)
        from mrefsr_tpu.archs.stylegan2_arch import StyleMLP
        rng, km = jax.random.split(rng)
        latent_in = jax.random.normal(km, (args.truncation_mean, 512))
        mlp_params = {k: v for k, v in variables['params'].items()
                      if k.startswith('style_mlp.')}
        w = StyleMLP(512, 8).apply({'params': mlp_params}, latent_in)
        truncation_latent = w.mean(0, keepdims=True)

    def sample_generator(rng):
        for _ in range(total_batch):
            rng, kz, kn = jax.random.split(rng, 3)
            z = jax.random.normal(kz, (args.batch_size, 512))
            img, _ = generator.apply(
                variables, [z], truncation=args.truncation,
                truncation_latent=truncation_latent, rngs={'noise': kn})
            # RAW [-1,1] output: the dataset FID stats are computed on
            # mean/std-0.5-normalized ([-1,1]) inputs (fid.py) — mapping
            # to [0,1] here made the two feature sets incomparable
            yield np.asarray(img)

    features = extract_inception_features(sample_generator(rng),
                                          feature_fn, total_batch)
    features = features[:args.num_sample]
    sample_mu = np.mean(features, 0)
    sample_cov = np.cov(features, rowvar=False)

    import torch
    stats = torch.load(args.fid_stats, map_location='cpu')
    fid = calculate_fid(sample_mu, sample_cov,
                        np.asarray(stats['mean']),
                        np.asarray(stats['cov']))
    print('fid:', fid)


if __name__ == '__main__':
    main()
