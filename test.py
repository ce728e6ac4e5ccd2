#!/usr/bin/env python
"""Root test launcher: ``python test.py -opt options/test/x.yml``
(same CLI surface as the reference's basicsr/test.py)."""
import os.path as osp

from mrefsr_tpu.test import test_pipeline

if __name__ == '__main__':
    root_path = osp.abspath(osp.dirname(__file__))
    test_pipeline(root_path)
