"""Generate a synthetic on-disk MegaDepth_v3_5ref-format dataset.

Produces the exact layout MultiRefMegaDepthDataset consumes (reference
basicsr/data/multi_ref_dataset.py:44-66): a CSV annotation file with
columns (target, H, M1, M2, L1, L2, p0..p5, scene) and per-scene JPEG
folders. Images are structured (gradients + random rectangles/circles +
noise) at photo-like sizes so JPEG decode cost is realistic — the point
is to measure the HOST input pipeline (decode, crop-around-point,
PIL-bicubic down/up x6 per sample) at production rates, not to train a
real model.

Usage:
  python scripts/make_synthetic_megadepth.py --root /tmp/synth_md \
      --scenes 4 --samples 64 --min-size 640 --max-size 1200
"""
import argparse
import csv
import os
import os.path as osp

import numpy as np
from PIL import Image


def _make_photo(rng, h, w):
    """Structured fake photo: smooth background + shapes + grain."""
    yy = np.linspace(0, 1, h, dtype=np.float32)[:, None, None]
    xx = np.linspace(0, 1, w, dtype=np.float32)[None, :, None]
    base = rng.rand(1, 1, 3).astype(np.float32)
    img = base + 0.5 * yy * rng.randn(1, 1, 3).astype(np.float32) \
        + 0.5 * xx * rng.randn(1, 1, 3).astype(np.float32)
    for _ in range(12):
        y0, x0 = rng.randint(0, h - 32), rng.randint(0, w - 32)
        hh = rng.randint(32, min(h - y0, h // 2) + 1)
        ww = rng.randint(32, min(w - x0, w // 2) + 1)
        img[y0:y0 + hh, x0:x0 + ww] += rng.randn(3).astype(np.float32) * 0.3
    img += rng.randn(h, w, 3).astype(np.float32) * 0.03
    img = np.clip(img, 0, 1)
    return (img * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--scenes', type=int, default=4)
    ap.add_argument('--samples', type=int, default=64)
    ap.add_argument('--min-size', type=int, default=640)
    ap.add_argument('--max-size', type=int, default=1200)
    ap.add_argument('--gt-size', type=int, default=160,
                    help='only used to keep match points interior')
    ap.add_argument('--quality', type=int, default=95)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    img_root = osp.join(args.root, 'MegaDepth_v3_5ref')
    os.makedirs(img_root, exist_ok=True)

    # images per scene: enough that target + 5 refs differ
    per_scene = max(8, args.samples // args.scenes + 6)
    scene_imgs = {}
    for s in range(args.scenes):
        scene = f'{s:04d}'
        sdir = osp.join(img_root, scene)
        os.makedirs(sdir, exist_ok=True)
        names, sizes = [], []
        for i in range(per_scene):
            h = int(rng.randint(args.min_size, args.max_size + 1))
            w = int(rng.randint(args.min_size, args.max_size + 1))
            name = f'img_{i:04d}.jpg'
            Image.fromarray(_make_photo(rng, h, w)).save(
                osp.join(sdir, name), quality=args.quality)
            names.append(name)
            sizes.append((h, w))
        scene_imgs[scene] = (names, sizes)

    def point(hw):
        h, w = hw
        m = args.gt_size // 2 + 2
        return [int(rng.randint(m, w - m)), int(rng.randint(m, h - m))]

    ann = osp.join(args.root, 'meta_info_synth_5ref.csv')
    with open(ann, 'w', newline='') as f:
        wr = csv.writer(f)
        wr.writerow(['target', 'H', 'M1', 'M2', 'L1', 'L2',
                     'p0', 'p1', 'p2', 'p3', 'p4', 'p5', 'scene'])
        for i in range(args.samples):
            scene = f'{i % args.scenes:04d}'
            names, sizes = scene_imgs[scene]
            idx = rng.choice(len(names), size=6, replace=False)
            row = [names[idx[0]]]
            row += [names[j] for j in idx[1:]]
            row += [str(point(sizes[j])) for j in idx]
            row.append(scene)
            wr.writerow(row)
    print(f'wrote {args.samples} samples / {args.scenes} scenes to '
          f'{img_root}; annotations: {ann}')


if __name__ == '__main__':
    main()
