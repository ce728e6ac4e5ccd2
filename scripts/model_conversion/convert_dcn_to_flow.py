"""Warm-start a flow-alignment MRAPA checkpoint from a DCN-alignment
one (including reference-trained checkpoints, which are DCN-only:
reference basicsr/archs/ref_mrapa_restoration_arch.py:45-76).

The flow variant (``network_g: alignment: flow``) is 2.8x faster on
TPU but not checkpoint-compatible with DynAgg; this converter maps a
DynAgg checkpoint onto FlowAgg's parameterization so training resumes
near the DCN model's behavior instead of from scratch — see
mrefsr_tpu.convert.dcn_to_flow_state_dict for the mapping and its
exactness conditions, and docs/TPUDesign.md for the measured
warm-start A/B.

Usage:
  python scripts/model_conversion/convert_dcn_to_flow.py \
      --input net_g_dcn.pth --output net_g_flow.pth \
      [--deform-groups 8]
"""
import argparse
import os.path as osp
import sys

import torch

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mrefsr_tpu.convert import dcn_to_flow_state_dict  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--input', required=True)
    ap.add_argument('--output', required=True)
    ap.add_argument('--deform-groups', type=int, default=8)
    args = ap.parse_args()

    ckpt = torch.load(args.input, map_location='cpu')
    if not isinstance(ckpt, dict):
        raise ValueError('expected a dict checkpoint')
    out = {}
    keys = [k for k in ('params', 'params_ema') if k in ckpt]
    if not keys:  # bare state dict
        out = dcn_to_flow_state_dict(ckpt,
                                     deform_groups=args.deform_groups)
    else:
        for k in keys:
            out[k] = dcn_to_flow_state_dict(
                ckpt[k], deform_groups=args.deform_groups)
        # keep non-param top-level keys (iter counters, metadata, ...)
        # so converted checkpoints stay resume-complete
        for k, v in ckpt.items():
            if k not in keys:
                out[k] = v
    torch.save(out, args.output)
    n = len(out[keys[0]]) if keys else len(out)
    print(f'converted {n} tensors -> {args.output}')


if __name__ == '__main__':
    main()
