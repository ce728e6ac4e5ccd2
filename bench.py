"""North-star benchmark: LMR 5-ref x4 SR training throughput per chip.

Measures the full stage3_5ref_restoration_mse training step (contrastive
VGG16 extraction on input + 5 refs, dense patch matching + offset
expansion, VGG19 ref features, MRAPA restoration with deformable
aggregation, L1 loss, Adam update with 4 LR groups) at the reference's
gt_size=160 on however many chips are attached, and reports
images/sec/chip.

vs_baseline: the reference publishes no throughput numbers
(BASELINE.md — "published": {}), so the denominator is a documented
nominal estimate of the reference's per-GPU stage3 throughput:
REF_IMGS_PER_SEC_PER_GPU = 12.0 (4xGPU DDP, batch 12/GPU — a typical
V100-class rate for this workload). Replace when a measured reference
number exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

REF_IMGS_PER_SEC_PER_GPU = 12.0


def main():
    import jax
    from mrefsr_tpu.models import build_model

    per_chip_batch = int(os.environ.get('BENCH_BATCH', '4'))
    gt = int(os.environ.get('BENCH_GT_SIZE', '160'))
    t = 5
    n_devices = jax.local_device_count()
    b = per_chip_batch * n_devices

    opt = {
        'name': 'bench', 'model_type': 'MultiRefRestorationModel',
        'scale': 4, 'crop_border': 4, 'num_gpu': n_devices,
        'manual_seed': 0, 'is_train': True, 'dist': False, 'rank': 0,
        'world_size': 1,
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
            'mixed_precision': os.environ.get('BENCH_MP', 'bfloat16') or None,
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

    # warmup (compile)
    model.feed_data(batch)
    for i in range(1, 4):
        model.optimize_parameters(i)
    jax.block_until_ready(model.vars_g['params'])

    # measure the jitted train step with device-resident inputs — in
    # production the async prefetcher double-buffers H2D copies behind
    # the step, so steady-state throughput is the step itself (and under
    # the axon tunnel, per-iter H2D re-upload would measure the tunnel,
    # not the framework)
    from mrefsr_tpu.parallel import batch_sharding
    sharding = batch_sharding(model.mesh)
    match_img_in = jax.device_put(model.match_img_in, sharding)
    refs = jax.device_put(model.img_ref_list, sharding)
    lq = jax.device_put(model.img_in_lq, sharding)
    gt_dev = jax.device_put(model.gt, sharding)
    step_fn = model._train_step_pix

    n_steps = int(os.environ.get('BENCH_STEPS', '10'))
    start = time.perf_counter()
    for i in range(4, 4 + n_steps):
        model.vars_g, model.opt_state_g, losses = step_fn(
            model.vars_g, model.opt_state_g, model.vars_extractor,
            model.vars_map, match_img_in, refs, lq, gt_dev, i - 1)
    jax.block_until_ready(model.vars_g['params'])
    # force a D2H of the last step's loss: a real completion barrier even
    # on runtimes whose block_until_ready returns at dispatch time
    float(losses['l_pix'])
    elapsed = time.perf_counter() - start

    imgs_per_sec = b * n_steps / elapsed
    imgs_per_sec_chip = imgs_per_sec / n_devices
    result = {
        'metric': 'lmr_5ref_x4_train_imgs_per_sec_per_chip',
        'value': round(imgs_per_sec_chip, 3),
        'unit': 'images/sec/chip',
        'vs_baseline': round(imgs_per_sec_chip /
                             REF_IMGS_PER_SEC_PER_GPU, 3),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
