"""Capture a device profile of the stage3 train step and print the top
HLO ops by self time (xprof parse of the xplane dump).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/benchmarks/profile_stage3.py
"""
import glob
import json
import os
import sys

import numpy as np


def main():
    import jax
    from mrefsr_tpu.models import build_model
    from mrefsr_tpu.parallel import batch_sharding

    b = int(os.environ.get('BENCH_BATCH', '4'))
    gt, t = 160, 5
    opt = {
        'name': 'bench', 'model_type': 'MultiRefRestorationModel',
        'scale': 4, 'crop_border': 4, 'num_gpu': 1, 'manual_seed': 0,
        'is_train': True, 'dist': False, 'rank': 0, 'world_size': 1,
        'network_g': {'type': 'MRAPARestorationNet', 'ngf': 64,
                      'n_blocks': 16, 'groups': 8},
        'network_map': {'type': 'CorrespondenceGenerationArch',
                        'patch_size': 3, 'stride': 1,
                        'vgg_layer_list': ['relu1_1', 'relu2_1',
                                           'relu3_1'],
                        'vgg_type': 'vgg19'},
        'network_extractor': {'type': 'ContrasMultiExtractorSep'},
        'path': {},
        'train': {
            'lr_g': 1e-4, 'lr_offset': 1e-4, 'lr_relu3_offset': 1e-6,
            'lr_relu2_offset': 1e-5, 'weight_decay_g': 0,
            'beta_g': [0.9, 0.999],
            'scheduler': {'type': 'MultiStepLR',
                          'milestones': [300000, 400000], 'gamma': 0.5},
            'total_iter': 100, 'warmup_iter': -1,
            'net_g_pretrain_steps': 0,
            'pixel_criterion': 'L1Loss', 'pixel_weight': 1.0,
            'mixed_precision': 'bfloat16',
        },
    }
    model = build_model(opt)
    rng = np.random.RandomState(0)
    batch = {
        'img_in': rng.rand(b, gt, gt, 3).astype(np.float32),
        'img_in_lq': rng.rand(b, gt // 4, gt // 4, 3).astype(np.float32),
        'img_in_up': rng.rand(b, gt, gt, 3).astype(np.float32),
        'img_ref_list': rng.rand(b, t, gt, gt, 3).astype(np.float32),
    }
    model.feed_data(batch)
    for i in range(1, 3):
        model.optimize_parameters(i)
    jax.block_until_ready(model.vars_g['params'])

    sharding = batch_sharding(model.mesh)
    match_img_in = jax.device_put(model.match_img_in, sharding)
    refs = jax.device_put(model.img_ref_list, sharding)
    lq = jax.device_put(model.img_in_lq, sharding)
    gt_dev = jax.device_put(model.gt, sharding)

    logdir = '/tmp/stage3_profile'
    os.system(f'rm -rf {logdir}')
    with jax.profiler.trace(logdir):
        for i in range(3):
            model.vars_g, model.opt_state_g, losses = \
                model._train_step_pix(
                    model.vars_g, model.opt_state_g, model.vars_extractor,
                    model.vars_map, match_img_in, refs, lq, gt_dev, i)
        jax.block_until_ready(model.vars_g['params'])

    planes = glob.glob(f'{logdir}/**/*.xplane.pb', recursive=True)
    print('xplane files:', planes, file=sys.stderr)
    if not planes:
        print('NO PROFILE CAPTURED')
        return

    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(planes, 'hlo_stats',
                                                   {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    cols = [c['label'] for c in obj['cols']]
    ci = {c: i for i, c in enumerate(cols)}
    rows = [[c.get('v') for c in r['c']] for r in obj['rows']]

    import collections
    cat = collections.Counter()
    for r in rows:
        cat[r[ci['HLO op category']]] += r[ci['Total self time (us)']] \
            or 0
    tot = sum(cat.values()) or 1.
    print(f'total self us: {tot:.0f}')
    for k, v in cat.most_common(12):
        print(f'{k:28s} {v:>10.0f} {100 * v / tot:5.1f}%')
    print()
    rows.sort(key=lambda r: -(r[ci['Total self time (us)']] or 0))
    print(f"{'op':30s} {'self_us':>9s} {'%':>6s} {'bound':12s} source")
    for r in rows[:25]:
        src = str(r[ci['Source Info']])
        src = src.split("title='")[-1].split('\n')[0][-48:]
        print(f"{str(r[ci['HLO op name']])[:30]:30s} "
              f"{(r[ci['Total self time (us)']] or 0):>9.0f} "
              f"{(r[ci['Total self time (%)']] or 0):>6.2f} "
              f"{str(r[ci['Bound by']])[:12]:12s} {src}")


if __name__ == '__main__':
    main()
