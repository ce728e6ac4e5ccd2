"""Minimal repro: pixel→GAN boundary HBM exhaustion at stage3 shapes.

Round-5 finding: the stage3 A/B arms (b=8, gt=160, bf16, 16-step
waves) die with ``RESOURCE_EXHAUSTED`` at the FIRST WGAN-GP wave for
both alignments, while the same GAN wave benches fine solo
(BENCH_GAN.json, ``BENCH_PHASE=gan python bench.py``). TPU executables
reserve scratch HBM at LOAD time, so a real training run crossing the
pixel→GAN boundary holds the pixel wave's + the validation forward's
reservations when the GAN wave loads — the bench never does.
``MultiRefRestorationModel._release_pretrain_executables`` frees them
at the boundary; this script drives the REAL model phase logic at the
failing shapes and reports which release policy makes the boundary
fit:

  python scripts/benchmarks/repro_gan_boundary.py \
      [--alignment dcn|flow] [--batch 8] [--gt 160] [--wave 16] \
      [--release full|attr|none] [--val] [--unroll N]

``--release none`` reproduces the original crash, ``attr`` drops only
the pixel-step jit wrappers (the round-5 first fix — insufficient when
the validation graph is resident), ``full`` (default) is the shipped
policy (wrapper drop + ``jax.clear_caches()``).
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--alignment', default='dcn',
                    choices=['dcn', 'flow'])
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--gt', type=int, default=160)
    ap.add_argument('--wave', type=int, default=16)
    ap.add_argument('--release', default='full',
                    choices=['full', 'attr', 'none'])
    ap.add_argument('--val', action='store_true',
                    help='run one eval forward mid-pretrain so the '
                         'validation graph is resident at the '
                         'boundary (matches real training)')
    ap.add_argument('--unroll', type=int, default=1,
                    help='network_g ref_unroll (the shipped flow MSE '
                         'configs use 5; it does not fit the GAN '
                         'wave)')
    ap.add_argument('--pretrain', type=int, default=None,
                    help='net_g_pretrain_steps constant baked into '
                         'the GAN-wave graph (default: one wave). The '
                         'A/B arms use 992; at b=8 the DCN GAN wave '
                         'sits at ~97%% HBM and XLA''s memory plan '
                         'varies run-to-run across otherwise-'
                         'equivalent constants — the 992-constant '
                         'executable cached by the arm exhausts HBM '
                         'even on a released device while a fresh '
                         '16-constant compile fits (measured round '
                         '5). --remat gives the wave real headroom.')
    ap.add_argument('--remat', action='store_true',
                    help='network_g dcn_outer_remat=true: numerics-'
                         'identical recompute that buys the DCN GAN '
                         'wave deterministic HBM headroom at b=8')
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(REPO, '.jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    import numpy as np
    from mrefsr_tpu.models import build_model

    k = args.wave
    b, gt, t = args.batch, args.gt, 5
    opt = {
        'name': 'repro_gan_boundary',
        'model_type': 'MultiRefRestorationModel',
        'scale': 4, 'crop_border': 4, 'num_gpu': 1,
        'manual_seed': 0, 'is_train': True, 'dist': False, 'rank': 0,
        'world_size': 1,
        'network_g': {'type': 'MRAPARestorationNet', 'ngf': 64,
                      'n_blocks': 16, 'groups': 8,
                      'alignment': args.alignment,
                      'ref_unroll': args.unroll,
                      'dcn_outer_remat': args.remat},
        'network_map': {'type': 'CorrespondenceGenerationArch',
                        'patch_size': 3, 'stride': 1,
                        'vgg_layer_list': ['relu1_1', 'relu2_1',
                                           'relu3_1'],
                        'vgg_type': 'vgg19'},
        'network_extractor': {'type': 'ContrasMultiExtractorSep'},
        'network_d': {'type': 'ImageDiscriminator', 'in_nc': 3,
                      'ndf': 32},
        'path': {},
        'train': {
            'lr_g': 1e-4, 'lr_offset': 1e-4, 'lr_relu3_offset': 1e-6,
            'lr_relu2_offset': 1e-5, 'weight_decay_g': 0,
            'beta_g': [0.9, 0.999],
            'lr_d': 1e-4, 'weight_decay_d': 0, 'beta_d': [0.9, 0.999],
            'gan_type': 'wgan', 'gan_weight': 1e-5,
            'grad_penalty_weight': 10.0,
            'scheduler': {'type': 'MultiStepLR',
                          'milestones': [300000, 400000],
                          'gamma': 0.5},
            'total_iter': 3 * k, 'warmup_iter': -1,
            'net_g_pretrain_steps': (k if args.pretrain is None
                                     else args.pretrain),
            'steps_per_dispatch': k,
            'pixel_criterion': 'L1Loss', 'pixel_weight': 1.0,
            'mixed_precision': 'bfloat16',
        },
    }
    model = build_model(opt)
    if args.release == 'none':
        model._release_pretrain_executables = lambda: None
    elif args.release == 'attr':
        orig = type(model)._release_pretrain_executables

        def attr_only(self=model):
            # replicate the first (insufficient) fix: wrapper drop
            # without the cache clear
            clear = jax.clear_caches
            jax.clear_caches = lambda: None
            try:
                orig(self)
            finally:
                jax.clear_caches = clear
        model._release_pretrain_executables = attr_only

    rng = np.random.RandomState(0)

    def batch(n):
        return {
            'img_in': rng.rand(n, gt, gt, 3).astype(np.float32),
            'img_in_lq': rng.rand(n, gt // 4, gt // 4,
                                  3).astype(np.float32),
            'img_in_up': rng.rand(n, gt, gt, 3).astype(np.float32),
            'img_ref_list': rng.rand(n, t, gt, gt,
                                     3).astype(np.float32),
        }

    def stage(name, fn):
        t0 = time.time()
        try:
            fn()
            jax.block_until_ready(model.vars_g)
            print(f'[repro] {name}: OK ({time.time() - t0:.1f}s)',
                  flush=True)
            return True
        except jax.errors.JaxRuntimeError as e:
            kind = ('RESOURCE_EXHAUSTED'
                    if 'RESOURCE_EXHAUSTED' in str(e) else 'error')
            print(f'[repro] {name}: {kind} after '
                  f'{time.time() - t0:.1f}s', flush=True)
            return False

    waves = [batch(b) for _ in range(k)]
    gan_start = opt['train']['net_g_pretrain_steps'] + 1
    ok = stage(f'pixel wave (iters 1..{k})',
               lambda: model.optimize_parameters_wave(waves, 1))
    if ok and args.val:
        def val():
            model.feed_data(batch(1))
            model.test()
        ok = stage('eval forward (validation graph resident)', val)
    if ok:
        ok = stage(
            f'GAN wave (iters {gan_start}..{gan_start + k - 1}, '
            f'release={args.release})',
            lambda: model.optimize_parameters_wave(waves, gan_start))
    if ok:
        ok = stage(f'second GAN wave (steady state)',
                   lambda: model.optimize_parameters_wave(
                       waves, gan_start + k))
    print(f'[repro] RESULT: '
          f'{"boundary fits" if ok else "boundary exhausts HBM"} '
          f'(alignment={args.alignment}, b={b}, gt={gt}, '
          f'release={args.release}, val={args.val}, '
          f'unroll={args.unroll})', flush=True)
    sys.exit(0 if ok else 3)


if __name__ == '__main__':
    main()
