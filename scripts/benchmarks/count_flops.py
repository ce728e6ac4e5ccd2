"""Per-stage FLOP audit of the stage3 train step via XLA cost analysis.

Grounds the derived reference baseline (BASELINE.md "Derived baseline")
and the roofline table (docs/TPUDesign.md): every stage of the
MultiRefRestorationModel pixel-phase step is jitted separately on CPU
and XLA's ``cost_analysis()['flops']`` is reported, normalized per
image. The stages mirror the reference's call graph
(basicsr/models/multi_ref_restoration_model.py:70-121):

  extractor   ContrasMultiExtractorSep on input_up + T refs
  matching    CorrespondenceGenerationArch (VGG19 ref feats + dense
              patch correlation + offset expansion)
  net_g_fwd   MRAPARestorationNet forward (content tower, DCN
              aggregation at 3 scales, MRAPA fusion, decoder)
  train_step  the full jitted step (all of the above + loss + backward
              + Adam) — backward/update cost is train_step minus the
              forwards.

``--phase gan`` instead audits one WGAN-GP phase iteration at the
reference's alternation defaults (net_d_steps=1, net_d_init_steps=0 —
reference multi_ref_restoration_model.py:172-173, so every iter runs
both the D update (real+fake D forwards, gradient-penalty
double-backward, D Adam) and the G update (full G forward+backward
through the pixel+GAN losses incl. a D forward, G Adam)). This grounds
the BENCH_GAN.json vs_baseline denominator the same way the pixel
count grounds BENCH_r*.json (BASELINE.md "GAN wave" section).

Usage: python scripts/benchmarks/count_flops.py [--batch 2] [--gt 160]
                                                [--phase pix|gan]
Writes JSON to stdout.
"""
import argparse
import json
import os
import os.path as osp
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)),
                            '..', '..'))


def _flops(jitted, *args):
    lowered = jitted.lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost['flops'])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--gt', type=int, default=160)
    ap.add_argument('--refs', type=int, default=5)
    ap.add_argument('--phase', choices=['pix', 'gan'], default='pix')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    from mrefsr_tpu.models import build_model

    b, gt, t = args.batch, args.gt, args.refs
    opt = {
        'name': 'flops', 'model_type': 'MultiRefRestorationModel',
        'scale': 4, 'crop_border': 4, 'num_gpu': 1, 'manual_seed': 0,
        'is_train': True, 'dist': False, 'rank': 0, 'world_size': 1,
        'network_g': {'type': 'MRAPARestorationNet', 'ngf': 64,
                      'n_blocks': 16, 'groups': 8,
                      'alignment': os.environ.get(
                          'BENCH_ALIGNMENT', 'dcn')},
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
        },
    }
    if args.phase == 'gan':
        # stage3 GAN-phase shape, same knobs as bench.py BENCH_PHASE=gan
        # (reference multi_ref_restoration_model.py:197-279)
        opt['network_d'] = {'type': 'ImageDiscriminator', 'in_nc': 3,
                            'ndf': 32}
        opt['train'].update({
            'lr_d': 1e-4, 'weight_decay_d': 0, 'beta_d': [0.9, 0.999],
            'gan_type': 'wgan', 'gan_weight': 1e-5,
            'grad_penalty_weight': 10.0, 'net_g_pretrain_steps': 0,
        })
    model = build_model(opt)
    rng = np.random.RandomState(0)
    batch = {
        'img_in': rng.rand(b, gt, gt, 3).astype(np.float32),
        'img_in_lq': rng.rand(b, gt // 4, gt // 4, 3).astype(np.float32),
        'img_in_up': rng.rand(b, gt, gt, 3).astype(np.float32),
        'img_ref_list': rng.rand(b, t, gt, gt, 3).astype(np.float32),
    }
    model.feed_data(batch)
    model._ensure_initialized(batch)

    mi, refs, lq = model.match_img_in, model.img_ref_list, model.img_in_lq
    vars_ex, vars_map = model.vars_extractor, model.vars_map
    params_g = model.vars_g['params']

    stages = {}

    if args.phase == 'gan':
        # one GAN-wave iteration at the reference alternation defaults
        # (net_d_steps=1 -> g_turn True every post-init iter): D update
        # with GP double-backward + full G update. The skip_g cond
        # branch is all-zeros aux, so its contribution to the count is
        # negligible whichever way XLA books the cond.
        model._build_train_step_gan()
        raw = model._train_step_gan_raw
        rng = model.next_rng()

        def gan_iter(vg, vd, og, od, ve, vm, mi_, r_, lq_, gt_, rng_):
            return raw(vg, vd, og, od, ve, vm, mi_, r_, lq_, gt_, rng_,
                       jnp_true)

        import jax.numpy as jnp
        jnp_true = jnp.asarray(True)
        total = _flops(jax.jit(gan_iter), model.vars_g, model.vars_d,
                       model.opt_state_g, model.opt_state_d, vars_ex,
                       vars_map, mi, refs, lq, model.gt, rng)
        # the pixel step at the same shapes, for the per-iter overhead
        # ratio the docs quote
        pix_step = model._build_train_step_pix()
        pix_total = _flops(pix_step, model.vars_g, model.opt_state_g,
                           vars_ex, vars_map, mi, refs, lq, model.gt, 0)
        out = {
            'batch': b, 'gt_size': gt, 'refs': t, 'phase': 'gan',
            'net_d_steps': model.net_d_steps,
            'net_d_init_steps': model.net_d_init_steps,
            'flops_total_per_image': total / b,
            'pix_step_flops_per_image': pix_total / b,
            'gan_over_pix_ratio': round(total / pix_total, 4),
        }
        print(json.dumps(out, indent=2))
        return

    ex = jax.jit(lambda ve, m, r: model._apply_extractor(ve, m, r))
    stages['extractor_fwd'] = _flops(ex, vars_ex, mi, refs)

    def run_map(ve, vm, m, r):
        d1, d2 = model._apply_extractor(ve, m, r)
        return model._run_map(d1, d2, r, vm)

    both = jax.jit(run_map)
    stages['matching_fwd'] = _flops(
        both, vars_ex, vars_map, mi, refs) - stages['extractor_fwd']

    fwd = jax.jit(model._forward)
    full_fwd = _flops(fwd, params_g, vars_ex, vars_map, mi, refs, lq)
    stages['net_g_fwd'] = (full_fwd - stages['extractor_fwd']
                           - stages['matching_fwd'])

    step = model._build_train_step_pix()
    total = _flops(step, model.vars_g, model.opt_state_g, vars_ex,
                   vars_map, mi, refs, lq, model.gt, 0)
    stages['backward_and_update'] = total - full_fwd
    stages['train_step_total'] = total

    out = {
        'batch': b, 'gt_size': gt, 'refs': t,
        'flops_total_per_image': total / b,
        'stages_flops_per_image': {k: v / b for k, v in stages.items()},
    }
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()
