#!/usr/bin/env python
"""Root training launcher: ``python train.py -opt options/train/x.yml``
(same CLI surface as the reference's basicsr/train.py)."""
import os.path as osp

from mrefsr_tpu.train import train_pipeline

if __name__ == '__main__':
    root_path = osp.abspath(osp.dirname(__file__))
    train_pipeline(root_path)
