"""Convert CelebA/FFHQ tfrecords to images or packed shards
(reference scripts/data_preparation/extract_images_from_tfrecords.py).
Requires tensorflow to parse tfrecords (gated)."""
import argparse
import glob
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def convert_celeba_tfrecords(tf_file, log_resolution, save_root,
                             save_type='img', compress_level=1):
    try:
        import tensorflow as tf
    except ImportError as exc:
        raise ImportError(
            'Please install tensorflow to parse tfrecords.') from exc

    phase = 'validation' if 'validation' in tf_file else 'train'
    resolution = 2**log_resolution
    if save_type == 'pack':
        from mrefsr_tpu.data.packio import PackWriter
        writer = PackWriter(
            osp.join(save_root,
                     f'celeba_{resolution}_{phase}.pack'))
    else:
        save_folder = osp.join(save_root,
                               f'celeba_{resolution}_{phase}')
        os.makedirs(save_folder, exist_ok=True)

    idx = 0
    for record in sorted(glob.glob(tf_file)):
        print('Processing record:', record)
        for raw in tf.data.TFRecordDataset(record):
            example = tf.train.Example()
            example.ParseFromString(raw.numpy())
            shape = example.features.feature['shape'].int64_list.value
            data = example.features.feature['data'].bytes_list.value[0]
            img = np.frombuffer(data, np.uint8).reshape(shape)
            img = img.transpose(1, 2, 0)[:, :, ::-1]  # CHW RGB -> HWC BGR
            if save_type == 'pack':
                _, buf = cv2.imencode(
                    '.png', img,
                    [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
                writer.put(f'{idx:08d}', buf.tobytes(),
                           shape=img.shape)
            else:
                cv2.imwrite(osp.join(save_folder, f'{idx:08d}.png'), img)
            idx += 1
    if save_type == 'pack':
        writer.close()
    print(f'Extracted {idx} images.')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--tf_file', type=str, required=True)
    parser.add_argument('--log_resolution', type=int, default=8)
    parser.add_argument('--save_root', type=str, default='datasets/celeba')
    parser.add_argument('--save_type', type=str, default='img',
                        choices=['img', 'pack'])
    args = parser.parse_args()
    convert_celeba_tfrecords(args.tf_file, args.log_resolution,
                             args.save_root, args.save_type)
