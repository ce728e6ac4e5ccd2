#!/usr/bin/env python
"""One-command CUFED5 accuracy-parity evaluation: the +-0.05 dB gate.

Given the reference's released checkpoints and the CUFED5 folder, this
imports the torch weights through mrefsr_tpu.convert and reproduces the
reference evaluation protocol exactly (reference
basicsr/models/multi_ref_restoration_model.py:316-382: zero-pad to
500x500 -> forward -> un-pad -> crop_border=4 -> PSNR (RGB), PSNR_Y,
SSIM_Y averaged over the 126 CUFED5 images), then optionally gates the
result against expected (paper / reference-run) numbers within a
tolerance (default 0.05 dB PSNR / 0.005 SSIM).

Usage:
    python scripts/eval_parity.py \
        --net_g experiments/pretrained_models/mrapa_restoration.pth \
        --extractor experiments/pretrained_models/feature_extraction_network.pth \
        --cufed5 datasets/CUFED/CUFED5 \
        [--vgg19 experiments/pretrained_models/vgg19-dcbb9e9d.pth] \
        [--expected-psnr N --expected-psnr-y N --expected-ssim-y N] \
        [--bf16] [--save-img]

The net_map's VGG19 trunk needs torchvision vgg19 weights: pass --vgg19
(raw torchvision state dict, converted on the fly). Checkpoints and the
dataset cannot be downloaded in this container (no egress) — this
script is the ready-to-run gate for the moment the assets land.

Exit status: 0 on success (and within tolerance when expectations are
given), 2 when a gate fails.
"""
import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def build_opt(args):
    results_root = osp.abspath(args.results_dir)
    opt = {
        'name': 'eval_parity_cufed5',
        'model_type': 'MultiRefRestorationModel',
        'scale': 4, 'crop_border': 4, 'num_gpu': 1, 'manual_seed': 10,
        'is_train': False, 'dist': False, 'rank': 0, 'world_size': 1,
        'datasets': {
            'test_1': {
                'name': 'CUFED5', 'type': 'MultiRefCUFEDSet',
                'dataroot_in': args.cufed5, 'dataroot_ref': args.cufed5,
                'phase': 'test', 'scale': 4, 'pad_to': args.canvas,
            },
        },
        'network_g': {'type': 'MRAPARestorationNet', 'ngf': args.ngf,
                      'n_blocks': args.n_blocks, 'groups': 8},
        'network_map': {'type': 'CorrespondenceGenerationArch',
                        'patch_size': 3, 'stride': 1,
                        'vgg_layer_list': ['relu1_1', 'relu2_1',
                                           'relu3_1'],
                        'vgg_type': 'vgg19'},
        'network_extractor': {'type': 'ContrasMultiExtractorSep'},
        'path': {
            'pretrain_network_g': args.net_g,
            'pretrain_network_feature_extractor': args.extractor,
            'strict_load': True,
            'results_root': results_root,
            'log': results_root,
            'visualization': osp.join(results_root, 'visualization'),
        },
        'val': {'save_img': args.save_img, 'suffix': None},
    }
    if args.vgg19:
        opt['path']['vgg_pretrain_path'] = args.vgg19
    if args.bf16:
        opt['val']['mixed_precision'] = 'bfloat16'
    return opt


def main():
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument('--net_g', required=True,
                   help='reference MRAPA restoration .pth')
    p.add_argument('--extractor', required=True,
                   help='reference feature_extraction_network.pth')
    p.add_argument('--cufed5', required=True, help='CUFED5 folder')
    p.add_argument('--vgg19', default=None,
                   help='torchvision vgg19 state dict for net_map')
    p.add_argument('--results-dir', default='results/eval_parity')
    p.add_argument('--save-img', action='store_true')
    p.add_argument('--bf16', action='store_true',
                   help='bfloat16 serving precision (NOT for the parity '
                        'gate; reference numerics are f32)')
    p.add_argument('--canvas', default='500',
                   help='padded eval canvas (500 = reference protocol); '
                        'a comma list, e.g. 300,400,500, enables '
                        'bucketed serving canvases (NOT for the parity '
                        'gate)')
    p.add_argument('--ngf', type=int, default=64,
                   help='net_g width (64 = released checkpoints)')
    p.add_argument('--n-blocks', type=int, default=16)
    p.add_argument('--expected-psnr', type=float, default=None)
    p.add_argument('--expected-psnr-y', type=float, default=None)
    p.add_argument('--expected-ssim-y', type=float, default=None)
    p.add_argument('--tol-db', type=float, default=0.05,
                   help='PSNR tolerance in dB (the north-star gate)')
    p.add_argument('--tol-ssim', type=float, default=0.005)
    args = p.parse_args()

    for path in (args.net_g, args.extractor, args.cufed5):
        if not osp.exists(path):
            p.error(f'not found: {path}')
    buckets = [int(v) for v in str(args.canvas).split(',')]
    args.canvas = buckets[0] if len(buckets) == 1 else buckets

    import logging

    from mrefsr_tpu.data import build_dataloader, build_dataset
    from mrefsr_tpu.models import build_model
    from mrefsr_tpu.utils import get_root_logger

    opt = build_opt(args)
    os.makedirs(opt['path']['results_root'], exist_ok=True)
    get_root_logger(log_level=logging.INFO)

    dataset_opt = opt['datasets']['test_1']
    test_set = build_dataset(dataset_opt)
    loader = build_dataloader(test_set, dataset_opt, num_gpu=1,
                              dist=False)
    model = build_model(opt)
    model.validation(loader, current_iter=opt['name'], tb_logger=None,
                     save_img=args.save_img)

    results = {k: float(v) for k, v in model.metric_results.items()}
    gates = {}
    ok = True
    for key, expected, tol in (
            ('psnr', args.expected_psnr, args.tol_db),
            ('psnr_y', args.expected_psnr_y, args.tol_db),
            ('ssim_y', args.expected_ssim_y, args.tol_ssim)):
        if expected is None:
            continue
        delta = results[key] - expected
        passed = abs(delta) <= tol
        gates[key] = {'expected': expected, 'got': results[key],
                      'delta': delta, 'tol': tol, 'pass': passed}
        ok = ok and passed
    print(json.dumps({'metrics': results, 'gates': gates,
                      'parity_ok': ok if gates else None}))
    sys.exit(0 if ok else 2)


if __name__ == '__main__':
    main()
