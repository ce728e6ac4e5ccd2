"""Component timing of the stage3 5-ref train step on TPU.

Splits the MultiRefRestorationModel pixel step into: contrastive VGG16
extraction, correspondence generation (patch matching + VGG19 ref
features), net_g forward, net_g fwd+bwd, and the full jitted step.
Timing uses the scan-based harness (tpu_timer): N iterations inside one
jitted lax.scan with a data-dependency chain through the carry — host
loops through the device tunnel mis-measure (per-call round-trip
latency dwarfs device time). All weights are passed as jit ARGUMENTS,
never closures, so XLA cannot constant-fold the frozen VGG towers
(pathological compile times).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/benchmarks/bench_stage3_parts.py
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, 'scripts/benchmarks')
from tpu_timer import dep_carry, scan_time  # noqa: E402


def chain_bench(name, fn, x0, *args, iters=8):
    """fn(x, *args) -> pytree; times with x perturbed by prior output."""
    def body(x, *a):
        out = fn(x, *a)
        return dep_carry(out, x), out

    dt = scan_time(body, x0, *args, n=iters)
    print(f'{name:34s} {dt*1e3:9.1f} ms', flush=True)
    return dt


def main():
    from mrefsr_tpu.models import build_model

    b = int(os.environ.get('BENCH_BATCH', '4'))
    gt, t = 160, 5
    opt = {
        'name': 'bench', 'model_type': 'MultiRefRestorationModel',
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
    model.optimize_parameters(1)  # init params + compile the real step

    bf = jnp.bfloat16
    cast = lambda tr: jax.tree_util.tree_map(  # noqa: E731
        lambda v: v.astype(bf) if v.dtype == jnp.float32 else v, tr)
    vars_ex = cast(model.vars_extractor)
    vars_map = cast(model.vars_map)
    params_bf = cast(model.vars_g['params'])
    match_img_in = model.match_img_in.astype(bf)
    refs = model.img_ref_list.astype(bf)
    lq = model.img_in_lq.astype(bf)
    gt_dev = model.gt

    # 1. extractor (VGG16 towers on input + 5 refs)
    def ex_fn(mi, r, ve):
        return model.net_extractor.apply(ve, mi, r)
    chain_bench('extractor (VGG16 x6)', ex_fn, match_img_in, refs, vars_ex)

    feats = jax.jit(ex_fn)(match_img_in, refs, vars_ex)
    d1, d2 = feats['dense_features1'], feats['dense_features2']

    # 2. correspondence generation (matching + offsets + VGG19)
    def map_fn(d1_, d2_, r, vm):
        return model._run_map(d1_, d2_, r, vm)
    chain_bench('corres gen (match+VGG19)', map_fn, d1, d2, refs, vars_map)

    pre_offset, img_ref_feat = jax.jit(map_fn)(d1, d2, refs, vars_map)

    # 3. net_g forward only
    def g_fn(lq_, po, irf, p):
        return model.net_g.apply({'params': p}, lq_, po, irf)
    chain_bench('net_g fwd (MRAPA+DCN)', g_fn, lq, pre_offset,
                img_ref_feat, params_bf)

    # 4. net_g fwd + bwd (grads wrt params)
    def g_loss(lq_, po, irf, p32, gt_):
        def inner(p):
            out = model.net_g.apply({'params': cast(p)}, lq_, po, irf)
            return jnp.abs(out.astype(jnp.float32) - gt_).mean()
        return jax.value_and_grad(inner)(p32)[1]
    chain_bench('net_g fwd+bwd', g_loss, lq, pre_offset, img_ref_feat,
                model.vars_g['params'], gt_dev)

    # 5. full pixel step (the bench.py measurement, for reference)
    def full(mi, vg, os_, ve, vm, r, lq_, gt_):
        _, _, losses = model._train_step_pix(vg, os_, ve, vm, mi, r,
                                             lq_, gt_, 1)
        return losses['l_pix']
    chain_bench('FULL jitted train step', full, model.match_img_in,
                model.vars_g, model.opt_state_g, model.vars_extractor,
                model.vars_map, model.img_ref_list, model.img_in_lq,
                gt_dev)


if __name__ == '__main__':
    main()
