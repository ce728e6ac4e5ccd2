"""BasicVSR++ video inference
(reference inference/inference_basicvsrpp.py): same driver shape as
inference_basicvsr with the second-order model.
"""
import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

from inference_basicvsr import main

from mrefsr_tpu.archs.basicvsrpp_arch import BasicVSRPlusPlus

if __name__ == '__main__':
    main(model_cls=BasicVSRPlusPlus,
         default_kwargs=dict(mid_channels=64, num_blocks=7,
                             max_residue_magnitude=10,
                             is_low_res_input=True),
         suffix='BasicVSRPP')
