"""Create native packed shards (.pack) from image folders — the
TPU-native analogue of create_lmdb.py, backed by native/packio.cpp."""
import argparse
import os.path as osp
import sys

import cv2

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.data.packio import PackWriter  # noqa: E402
from mrefsr_tpu.utils.misc import scandir  # noqa: E402


def create_pack_from_folder(folder, pack_path, suffix='png',
                            recursive=False, compress_level=1):
    img_paths = sorted(scandir(folder, suffix=suffix,
                               recursive=recursive))
    writer = PackWriter(pack_path)
    for idx, rel in enumerate(img_paths):
        key = rel.split(f'.{suffix}')[0]
        img = cv2.imread(osp.join(folder, rel), cv2.IMREAD_UNCHANGED)
        h, w = img.shape[:2]
        c = 1 if img.ndim == 2 else img.shape[2]
        _, img_byte = cv2.imencode(
            '.png', img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        writer.put(key, img_byte.tobytes(), shape=(h, w, c),
                   compress_level=compress_level)
        if (idx + 1) % 500 == 0:
            print(f'{idx + 1}/{len(img_paths)}')
    writer.close()
    print(f'Wrote {len(img_paths)} images to {pack_path}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('folder', type=str)
    parser.add_argument('pack_path', type=str,
                        help='output shard, e.g. data_train.pack')
    parser.add_argument('--suffix', type=str, default='png')
    parser.add_argument('--recursive', action='store_true')
    args = parser.parse_args()
    create_pack_from_folder(args.folder, args.pack_path,
                            suffix=args.suffix, recursive=args.recursive)
