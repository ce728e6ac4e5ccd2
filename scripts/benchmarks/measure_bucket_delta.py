"""Quantify the serving-bucket accuracy delta (500-canvas vs buckets).

The shipped serving config (options/test/test_5ref_cufed5_serving.yml)
pads each eval image to the smallest per-dimension bucket instead of
the reference's fixed 500x500 canvas (reference
basicsr/data/multi_ref_dataset.py:174-180). Padding extent perturbs
patch matching near borders, so the bucketed protocol is serving-only —
this script MEASURES that perturbation on synthetic CUFED5-like images:

  for each image: run the identical model on (a) the 500 canvas and
  (b) its bucket canvas, un-pad both outputs, and report
    - PSNR/SSIM of each vs the ground truth (protocol-level delta)
    - PSNR between the two outputs (direct agreement)

Usage:
  python scripts/benchmarks/measure_bucket_delta.py \
      [--images 6] [--out /tmp/bucket_delta] [--seed 0]

Writes one JSON line with the summary to stdout.
"""
import argparse
import glob
import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)),
                            '..', '..'))

SIZES = [(500, 332), (332, 500), (500, 500), (464, 340), (400, 296),
         (356, 500)]


def _make_cufed_like(root, n, seed, sizes=None):
    import cv2
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        sz = sizes or SIZES
        h, w = sz[i % len(sz)]
        base = None
        for j in range(6):
            img = np.zeros((h, w, 3), np.float32)
            yy = np.linspace(0, 1, h)[:, None, None]
            xx = np.linspace(0, 1, w)[None, :, None]
            img += 0.4 + 0.3 * yy * rng.randn(3) + 0.3 * xx * rng.randn(3)
            for _ in range(10):
                y0, x0 = rng.randint(0, h - 24), rng.randint(0, w - 24)
                hh, ww = rng.randint(16, h // 3), rng.randint(16, w // 3)
                img[y0:y0 + hh, x0:x0 + ww] += rng.randn(3) * 0.25
            img += rng.randn(h, w, 3) * 0.02
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            if j == 0:
                base = img
            else:
                # refs: shifted/recolored variants of the target so the
                # patch matcher has real correspondences to find
                dy, dx = rng.randint(-12, 13), rng.randint(-12, 13)
                ref = np.roll(base, (dy, dx), (0, 1)).astype(np.float32)
                ref = np.clip(ref * rng.uniform(0.9, 1.1) +
                              rng.randn(3) * 4, 0, 255).astype(np.uint8)
                img = ref
            cv2.imwrite(osp.join(root, f'{i:03d}_{j}.png'), img)


def _eval_protocol(root, pad_to, mp=None, ngf=64,
                   n_blocks=16, groups=8):
    """Run the CUFED eval protocol over `root` with the given pad_to;
    returns list of (name, sr_unpadded, gt)."""
    import jax.numpy as jnp

    from mrefsr_tpu.data import build_dataset
    from mrefsr_tpu.models import build_model

    opt = {
        'name': 'bucket_delta', 'model_type': 'MultiRefRestorationModel',
        'scale': 4, 'crop_border': 4, 'num_gpu': 1, 'manual_seed': 0,
        'is_train': False, 'dist': False, 'rank': 0, 'world_size': 1,
        'network_g': {'type': 'MRAPARestorationNet', 'ngf': ngf,
                      'n_blocks': n_blocks,
                      'groups': groups},
        'network_map': {'type': 'CorrespondenceGenerationArch',
                        'patch_size': 3, 'stride': 1,
                        'vgg_layer_list': ['relu1_1', 'relu2_1',
                                           'relu3_1'],
                        'vgg_type': 'vgg19'},
        'network_extractor': {'type': 'ContrasMultiExtractorSep'},
        'path': {},
        'val': {'val_freq': 1, 'save_img': False},
    }
    if mp:
        opt['val']['mixed_precision'] = mp
    model = build_model(opt)
    ds = build_dataset({'name': 'cufed', 'type': 'MultiRefCUFEDSet',
                        'phase': 'val', 'scale': 4,
                        'dataroot_in': root, 'dataroot_ref': root,
                        'pad_to': pad_to})
    results = []
    for idx in range(len(ds)):
        item = ds[idx]
        batch = {k: (v[None] if isinstance(v, np.ndarray) else v)
                 for k, v in item.items()}
        model.feed_data(batch)
        model.test()
        sr = np.asarray(model.output)[0].astype(np.float32)
        oh, ow = item['original_size']
        sr = sr[:oh, :ow]
        gt = item['img_in'][:oh, :ow]
        results.append((osp.basename(item['lq_path']), sr, gt))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', type=int, default=6)
    ap.add_argument('--out', default='/tmp/bucket_delta')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--buckets', type=int, nargs='+',
                    default=[300, 332, 400, 500])
    ap.add_argument('--mixed-precision', default=None)
    args = ap.parse_args()

    from mrefsr_tpu.metrics import calculate_psnr, calculate_ssim

    root = osp.join(args.out, 'cufed_like')
    # reuse the on-disk set only when it matches THIS run's parameters
    # (a count/seed mismatch would silently measure a stale set)
    stamp = osp.join(root, '.params')
    want = f'images={args.images} seed={args.seed}'
    have = open(stamp).read() if osp.isfile(stamp) else None
    if have != want or not glob.glob(osp.join(root, '*_0.png')):
        if osp.isdir(root):
            import shutil
            shutil.rmtree(root)
        _make_cufed_like(root, args.images, args.seed)
        with open(stamp, 'w') as f:
            f.write(want)

    ref = _eval_protocol(root, 500, args.mixed_precision)
    buck = _eval_protocol(root, args.buckets, args.mixed_precision)

    rows, agree = [], []
    for (name, sr5, gt), (_, srb, _) in zip(ref, buck):
        p5 = calculate_psnr(sr5 * 255, gt * 255, crop_border=4)
        pb = calculate_psnr(srb * 255, gt * 255, crop_border=4)
        s5 = calculate_ssim(sr5 * 255, gt * 255, crop_border=4)
        sb = calculate_ssim(srb * 255, gt * 255, crop_border=4)
        if sr5.shape == srb.shape:
            pa = calculate_psnr(sr5 * 255, srb * 255, crop_border=0)
            agree.append(pa)
        rows.append({'name': name, 'psnr_500': p5, 'psnr_bucket': pb,
                     'dpsnr': pb - p5, 'dssim': sb - s5})
        print(f'{name}: psnr 500={p5:.3f} bucket={pb:.3f} '
              f'd={pb - p5:+.4f} dB; ssim d={sb - s5:+.5f}',
              file=sys.stderr)

    dp = [r['dpsnr'] for r in rows]
    dsv = [r['dssim'] for r in rows]
    print(json.dumps({
        'images': len(rows), 'buckets': args.buckets,
        'mean_abs_dpsnr_db': float(np.mean(np.abs(dp))),
        'max_abs_dpsnr_db': float(np.max(np.abs(dp))),
        'mean_dssim': float(np.mean(dsv)),
        'output_agreement_psnr_db': (float(np.mean(agree))
                                     if agree else None),
        'mixed_precision': args.mixed_precision,
    }))


if __name__ == '__main__':
    main()
