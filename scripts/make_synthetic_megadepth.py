"""Generate a synthetic on-disk MegaDepth_v3_5ref-format dataset.

Produces the exact layout MultiRefMegaDepthDataset consumes (reference
basicsr/data/multi_ref_dataset.py:44-66): a CSV annotation file with
columns (target, H, M1, M2, L1, L2, p0..p5, scene) and per-scene JPEG
folders. Images are structured (gradients + random rectangles/circles +
noise) at photo-like sizes so JPEG decode cost is realistic — the point
is to measure the HOST input pipeline (decode, crop-around-point,
PIL-bicubic down/up x6 per sample) at production rates, not to train a
real model.

``--correlated`` switches to a multi-view mode for ACCURACY
experiments (the flow-vs-DCN alignment A/B): each scene is a set of
views (translated, slightly rescaled, photometrically jittered crops)
of one shared world canvas — the synthetic analog of MegaDepth's
multi-view photos — and match points are the projections of one world
point into each view, perturbed by ``--jitter`` px of annotation
noise. Reference crops then contain the SAME content as the target,
misaligned by a few px plus a smooth scale field, so the restoration
net can only exploit the HR refs by aligning them: alignment quality
becomes visible in val PSNR. ``--cufed-out`` additionally writes a
held-out eval set in the MultiRefCUFEDSet layout (``*_0.png`` target +
``*_1..5.png`` refs, reference multi_ref_dataset.py:143-160) from
scenes disjoint with the training scenes.

Usage:
  python scripts/make_synthetic_megadepth.py --root /tmp/synth_md \
      --scenes 4 --samples 64 --min-size 640 --max-size 1200
  python scripts/make_synthetic_megadepth.py --root /tmp/ab_md \
      --correlated --scenes 6 --samples 96 \
      --cufed-out /tmp/ab_md/cufed_val --cufed-samples 16
"""
import argparse
import csv
import os
import os.path as osp

import numpy as np
from PIL import Image


def _make_photo(rng, h, w, texture=0.0):
    """Structured fake photo: smooth background + shapes + grain.

    ``texture`` > 0 adds band-limited multi-scale texture (smoothed
    noise at 2/4/8-px scales) that survives JPEG and x4 downsampling —
    the transferable high-frequency content that makes reference-based
    SR (and therefore the alignment A/B) non-trivial on this data."""
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
    if texture:
        for scale, amp in ((2, 0.5), (4, 0.7), (8, 1.0)):
            n = rng.randn((h + scale - 1) // scale,
                          (w + scale - 1) // scale, 3).astype(np.float32)
            n = np.array(Image.fromarray(
                np.clip(n * 64 + 128, 0, 255).astype(np.uint8)).resize(
                    (w, h), Image.BILINEAR), np.float32)
            img += (n - 128) / 64 * (texture * amp)
    img += rng.randn(h, w, 3).astype(np.float32) * 0.03
    img = np.clip(img, 0, 1)
    return (img * 255).astype(np.uint8)


def _make_views(rng, world, n_views, vmin, vmax, scale_jitter, margin):
    """Cut n_views translated/rescaled/photometrically-jittered views
    out of one world canvas. Every view is constrained to cover the
    world-center square of half-size ``margin`` so a shared match point
    exists. Returns (view_u8, origin_yx, scale) triples where a world
    point pw maps to view coords (pw - origin) * scale."""
    wh, ww = world.shape[:2]
    cy, cx = wh // 2, ww // 2
    views = []
    for _ in range(n_views):
        vh = int(rng.randint(vmin, vmax + 1))
        vw = int(rng.randint(vmin, vmax + 1))
        y0 = int(rng.randint(max(0, cy + margin - vh),
                             min(wh - vh, cy - margin) + 1))
        x0 = int(rng.randint(max(0, cx + margin - vw),
                             min(ww - vw, cx - margin) + 1))
        crop = world[y0:y0 + vh, x0:x0 + vw].astype(np.float32)
        # mild photometric jitter: refs stay informative but not
        # pixel-identical (multi-view photos differ in exposure)
        gain = 1.0 + rng.uniform(-0.08, 0.08)
        bias = rng.uniform(-10, 10)
        crop = np.clip(crop * gain + bias, 0, 255).astype(np.uint8)
        scale = 1.0 + rng.uniform(-scale_jitter, scale_jitter)
        if abs(scale - 1.0) > 1e-6:
            out_w = max(2, int(round(vw * scale)))
            out_h = max(2, int(round(vh * scale)))
            crop = np.array(Image.fromarray(crop).resize(
                (out_w, out_h), Image.BICUBIC))
            scale_y = out_h / vh
            scale_x = out_w / vw
        else:
            scale_y = scale_x = 1.0
        views.append((crop, (y0, x0), (scale_y, scale_x)))
    return views


def _project(pw_xy, origin_yx, scale_yx):
    """World point [x, y] -> view coords [x, y]."""
    y = (pw_xy[1] - origin_yx[0]) * scale_yx[0]
    x = (pw_xy[0] - origin_yx[1]) * scale_yx[1]
    return [int(round(x)), int(round(y))]


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
    ap.add_argument('--correlated', action='store_true',
                    help='multi-view mode: scene images are views of '
                         'one world canvas with consistent match points')
    ap.add_argument('--jitter', type=int, default=4,
                    help='correlated mode: max match-point annotation '
                         'noise (px) applied to REF points')
    ap.add_argument('--scale-jitter', type=float, default=0.06,
                    help='correlated mode: per-view rescale range 1±s')
    ap.add_argument('--cufed-out', default=None,
                    help='also write a held-out eval set in '
                         'MultiRefCUFEDSet *_0..5.png layout here')
    ap.add_argument('--cufed-samples', type=int, default=16)
    ap.add_argument('--cufed-size', type=int, default=160,
                    help='eval crop size (use pad_to: <this> in the '
                         'val dataset config)')
    args = ap.parse_args()

    if args.correlated:
        return main_correlated(args)

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


def main_correlated(args):
    """Multi-view scenes for alignment-accuracy experiments."""
    rng = np.random.RandomState(args.seed)
    img_root = osp.join(args.root, 'MegaDepth_v3_5ref')
    os.makedirs(img_root, exist_ok=True)
    world_size = args.max_size + 400
    views_per_scene = 8
    # every view covers world-center ± margin, so match points drawn
    # anywhere in the ±spread central region stay interior to every
    # view even after scale/jitter; spread keeps crops diverse
    spread = 150
    # slack term 40 covers scale-jitter shrink of the projected
    # coverage (<=6% of 258) plus rounding; match_point_crop clamps as
    # a final backstop
    margin = args.gt_size // 2 + args.jitter + 40 + spread
    if args.min_size < 2 * margin:
        raise SystemExit(
            f'--correlated needs every view to cover world-center '
            f'+-{margin}px (gt-size/2 + jitter + slack + spread): '
            f'raise --min-size to >= {2 * margin} (got '
            f'{args.min_size}) or lower --gt-size/--jitter')

    rows = []
    for s in range(args.scenes):
        scene = f'{s:04d}'
        sdir = osp.join(img_root, scene)
        os.makedirs(sdir, exist_ok=True)
        world = _make_photo(rng, world_size, world_size, texture=0.12)
        views = _make_views(rng, world, views_per_scene, args.min_size,
                            args.max_size, args.scale_jitter, margin)
        names = []
        for i, (img, _, _) in enumerate(views):
            name = f'img_{i:04d}.jpg'
            Image.fromarray(img).save(osp.join(sdir, name),
                                      quality=args.quality)
            names.append(name)

        n_scene = args.samples // args.scenes + (
            s < args.samples % args.scenes)
        cy = cx = world_size // 2
        half = margin - args.gt_size // 2 - args.jitter - 4
        for _ in range(n_scene):
            idx = rng.choice(views_per_scene, size=6, replace=False)
            pw = [cx + int(rng.randint(-half, half + 1)),
                  cy + int(rng.randint(-half, half + 1))]  # [x, y]
            pts = []
            for j, vi in enumerate(idx):
                _, org, sc = views[vi]
                p = _project(pw, org, sc)
                if j > 0 and args.jitter:  # annotation noise, refs only
                    p = [p[0] + int(rng.randint(-args.jitter,
                                                args.jitter + 1)),
                         p[1] + int(rng.randint(-args.jitter,
                                                args.jitter + 1))]
                pts.append(p)
            rows.append([names[idx[0]]] + [names[j] for j in idx[1:]]
                        + [str(p) for p in pts] + [scene])

    ann = osp.join(args.root, 'meta_info_synth_5ref.csv')
    with open(ann, 'w', newline='') as f:
        wr = csv.writer(f)
        wr.writerow(['target', 'H', 'M1', 'M2', 'L1', 'L2',
                     'p0', 'p1', 'p2', 'p3', 'p4', 'p5', 'scene'])
        wr.writerows(rows)
    print(f'wrote {len(rows)} correlated samples / {args.scenes} scenes '
          f'to {img_root}; annotations: {ann}')

    if args.cufed_out:
        write_cufed_val(args)


def write_cufed_val(args):
    """Held-out eval set in the MultiRefCUFEDSet file layout: target
    ``{i:03d}_0.png`` + refs ``{i:03d}_{1..5}.png``, every image
    ``--cufed-size`` square (set ``pad_to: <cufed-size>`` in the val
    dataset config so eval pads nothing). Seed offset keeps these
    scenes disjoint from the training scenes."""
    rng = np.random.RandomState(args.seed + 100003)
    os.makedirs(args.cufed_out, exist_ok=True)
    gt = args.cufed_size
    margin = gt // 2 + args.jitter + 24
    world_size = args.max_size + 400
    if args.min_size < 2 * margin:
        raise SystemExit(
            f'--cufed-out needs --min-size >= {2 * margin} for '
            f'--cufed-size {gt} (views must cover the shared match '
            f'region)')
    for i in range(args.cufed_samples):
        world = _make_photo(rng, world_size, world_size, texture=0.12)
        views = _make_views(rng, world, 6, args.min_size, args.max_size,
                            args.scale_jitter, margin)
        cy = cx = world_size // 2
        half = margin - gt // 2 - args.jitter - 4
        pw = [cx + int(rng.randint(-half, half + 1)),
              cy + int(rng.randint(-half, half + 1))]
        for j, (img, org, sc) in enumerate(views):
            p = _project(pw, org, sc)
            if j > 0 and args.jitter:
                p = [p[0] + int(rng.randint(-args.jitter,
                                            args.jitter + 1)),
                     p[1] + int(rng.randint(-args.jitter,
                                            args.jitter + 1))]
            h, w = img.shape[:2]
            y0 = min(max(p[1] - gt // 2, 0), h - gt)
            x0 = min(max(p[0] - gt // 2, 0), w - gt)
            Image.fromarray(img[y0:y0 + gt, x0:x0 + gt]).save(
                osp.join(args.cufed_out, f'{i:03d}_{j}.png'))
    print(f'wrote {args.cufed_samples} held-out eval samples to '
          f'{args.cufed_out}')


if __name__ == '__main__':
    main()
